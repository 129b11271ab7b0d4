# Spec constants in this file reproduce task-specification values from
# dm_control (github.com/google-deepmind/dm_control), Copyright The
# dm_control Authors, Apache License 2.0.
"""Optimal LQR policy (behavioural parity: reference suite/lqr_solver.py).

Solves the discrete algebraic Riccati equation for the lqr domain's
linear dynamics; used by tests as an analytic end-to-end oracle.
"""

from __future__ import annotations

import jax
import numpy as np

try:
  from scipy import linalg as scipy_linalg
except ImportError:  # pragma: no cover
  scipy_linalg = None


def _solve_dare(a, b, q, r, iters=10000, tol=1e-12):
  """DARE fixed-point iteration fallback when scipy is unavailable."""
  if scipy_linalg is not None:
    return scipy_linalg.solve_discrete_are(a, b, q, r)
  p = q.copy()
  for _ in range(iters):
    btp = b.T @ p
    k = np.linalg.solve(r + btp @ b, btp @ a)
    p_next = q + a.T @ p @ (a - b @ k)
    p_next = 0.5 * (p_next + p_next.T)
    if np.abs(p_next - p).max() < tol:
      return p_next
    p = p_next
  return p


def solve(env):
  """Returns (p, k, beta): value Hessian, optimal gains, decay rate."""
  model = env.model
  n = model.nq
  m = model.nu

  # mass matrix at qpos0 (semi-implicit Euler linearization, matching
  # the engine's integrator)
  from dm_control_tpu.models import types
  from dm_control_tpu.ops import smooth

  data = types.make_data(model)
  d = jax.jit(lambda mm, dd: smooth.crb(
      mm, smooth.com_pos(mm, smooth.kinematics(mm, dd))))(model, data)
  mass = np.asarray(jax.device_get(d.qM), dtype=np.float64)

  stiffness = np.diag(np.asarray(model.jnt_stiffness,
                                 dtype=np.float64).ravel())
  damping = np.diag(np.asarray(model.dof_damping,
                               dtype=np.float64).ravel())
  dt = float(model.opt.timestep)

  j = np.linalg.solve(-mass, np.hstack((stiffness, damping)))
  a = np.eye(2 * n) + dt * np.vstack(
      (dt * j + np.hstack((np.zeros((n, n)), np.eye(n))), j))

  b = np.vstack((np.eye(m), np.zeros((n - m, m))))
  bc = np.linalg.solve(mass, b)
  b = dt * np.vstack((dt * bc, bc))

  q = np.diag(np.hstack([np.ones(n), np.zeros(n)]))
  r = env.task.control_cost_coef * np.eye(m)

  p = _solve_dare(a, b, q, r)
  k = -np.linalg.solve(b.T @ p @ b + r, b.T @ p @ a)

  beta = np.abs(np.linalg.eigvals(a + b @ k)).max()
  if beta >= 1.0:
    raise RuntimeError('Controlled system is unstable.')
  return p, k, beta
