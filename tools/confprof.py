"""Micro-profile of fwd_constraint_batched internals on rollout states.

Splits the constraint solve into its real cost centers so kernel work
targets the right piece: row assembly (make_rows), impedance prep, one
full-width Newton iteration (and its parts: cone Hessian weights, H
assembly einsum, Cholesky solve, line search scan), and the epilogue.

Usage: python tools/confprof.py [domain:task] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import jax

from dm_control_tpu import _cache
_cache.configure(jax.config, os.path.join(os.path.dirname(__file__), '..'))

import jax.numpy as jnp
import numpy as np


def timeit(name, f, *args, iters=20):
  out = jax.block_until_ready(f(*args))
  t0 = time.perf_counter()
  for _ in range(iters):
    out = f(*args)
  jax.block_until_ready(out)
  dt = (time.perf_counter() - t0) / iters
  print(f'{name:40s} {dt * 1e3:9.3f} ms')
  return dt


def main():
  spec = sys.argv[1] if len(sys.argv) > 1 else 'humanoid:run'
  batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
  domain_name, task_name = spec.split(':')

  import importlib
  from dm_control_tpu.ops import constraint
  from dm_control_tpu.ops import forward as fwd
  from dm_control_tpu.ops import pallas_kernels
  from dm_control_tpu.parallel import BatchedEnvironment

  domain = importlib.import_module(f'dm_control_tpu.suite.{domain_name}')
  env = domain.SUITE[task_name]()
  m, task = env.model, env.task
  benv = BatchedEnvironment(m, task, batch_size=batch,
                            n_sub_steps=env.n_sub_steps, seed=0)
  benv.reset()
  benv.rollout_random(30)
  state = benv._state
  model = benv.model
  print(f'# {spec} batch={batch} nv={m.nv} nefc_max={m.nefc_max} '
        f'ncon_sel={m.ncon_sel}')

  # full Data at a realistic pre-constraint point
  def pre(s):
    D = jax.vmap(lambda ss: fwd.inflate(model, ss))(s)
    D = jax.vmap(lambda d: fwd.fwd_pv(model, d, False))(D)
    D = jax.vmap(lambda d: fwd.fwd_actuation(model, d))(D)
    D = jax.vmap(lambda d: fwd.fwd_acceleration(model, d))(D)
    return D

  D = jax.block_until_ready(jax.jit(pre)(state))

  timeit('fwd_constraint_batched (all)',
         jax.jit(lambda DD: constraint.fwd_constraint_batched(model, DD)),
         D)

  # ---- pieces ----
  mk = jax.jit(jax.vmap(lambda d: constraint.make_rows(model, d)))
  timeit('make_rows (vmapped)', mk, D)
  rows = jax.block_until_ready(mk(D))

  dtype = D.qpos.dtype
  nefc = rows.J.shape[-1]

  def prep(rows, D):
    pmm = rows.pos - rows.margin
    imp = constraint._impedance(rows.solimp, pmm)
    vel = jnp.einsum('bv,bve->be', D.qvel, rows.J)
    spring = jnp.asarray(
        constraint._elliptic_spring_scale(model, nefc), dtype)
    aref = constraint._kbip(model, rows.solref, rows.solimp, imp,
                            pmm * spring, vel)
    r = jnp.maximum((1.0 - imp) / imp * rows.invweight, 1e-12)
    dweight = jnp.where(rows.slot_active > 0, 1.0 / r, 0.0)
    return aref, dweight

  timeit('impedance/aref prep', jax.jit(prep), rows, D)
  aref, dweight = jax.block_until_ready(jax.jit(prep)(rows, D))

  M, a0, J = D.qM, D.qacc_smooth, rows.J
  eq = rows.eq_mask == 1.0
  fric = rows.eq_mask == 2.0
  floss = rows.frictionloss
  mu_rows = rows.mu
  groups = constraint._elliptic_groups(model)
  cone_args = (dweight, eq, fric, floss, mu_rows, groups)
  x = D.qacc_warmstart

  def jmul(x):
    return jnp.einsum('bv,bve->be', x, J)

  jar = jax.block_until_ready(jax.jit(lambda x: jmul(x) - aref)(x))

  timeit('jmul (J pass)', jax.jit(jmul), x)
  timeit('hess_cone (w, Jh)',
         jax.jit(lambda j: constraint._hess_cone(j, J, *cone_args)), jar)
  w, Jh = jax.block_until_ready(
      jax.jit(lambda j: constraint._hess_cone(j, J, *cone_args))(jar))

  def hassemble(Jh, w):
    wJh = (Jh * w[..., None, :]).astype(jnp.bfloat16)
    return M + jnp.einsum('bve,bwe->bvw', wJh, Jh.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

  timeit('H assembly (bf16 einsum)', jax.jit(hassemble), Jh, w)
  H = jax.block_until_ready(jax.jit(hassemble)(Jh, w))

  def grad_of(x, jar):
    return jnp.einsum('bij,bj->bi', M, x - a0) - jnp.einsum(
        'bve,be->bv', J, constraint._row_force_cone(jar, *cone_args))

  timeit('grad (force + jtmul + mmul)', jax.jit(grad_of), x, jar)
  g = jax.block_until_ready(jax.jit(grad_of)(x, jar))

  timeit('chol_solve_batched',
         jax.jit(pallas_kernels.chol_solve_batched), H, g)
  p = jax.block_until_ready(
      jax.jit(pallas_kernels.chol_solve_batched)(H, g))

  def linesearch(jar, p):
    jp = jmul(p)
    mp = jnp.einsum('bij,bj->bi', M, p)
    pMp = jnp.einsum('bi,bi->b', p, mp)
    pM_dx = jnp.einsum('bi,bi->b', p, jnp.einsum(
        'bij,bj->bi', M, x - a0))

    def ls_body(carry, _):
      alpha, lo, hi = carry
      ra = jar + alpha[:, None] * jp
      drows, ddrows = constraint._ls_rows_cone(ra, jp, *cone_args)
      dphi = pM_dx + alpha * pMp - jnp.sum(drows, axis=-1)
      ddphi = pMp + jnp.sum(ddrows, axis=-1)
      lo = jnp.where(dphi < 0, jnp.maximum(lo, alpha), lo)
      hi = jnp.where(dphi > 0, jnp.minimum(hi, alpha), hi)
      newton = alpha - dphi / jnp.maximum(ddphi, 1e-12)
      inside = (newton > lo) & (newton < hi)
      alpha = jnp.where(inside, newton, 0.5 * (lo + hi))
      return (alpha, lo, hi), None

    B = p.shape[0]
    (alpha, _, _), _ = jax.lax.scan(
        ls_body, (jnp.ones(B, dtype), jnp.zeros(B, dtype),
                  jnp.full(B, 4.0, dtype)), None, length=8, unroll=8)
    return alpha

  timeit('line search (8 unrolled)', jax.jit(linesearch), jar, p)

  def cost_of(x, jar):
    dv = x - a0
    return 0.5 * jnp.einsum('bi,bi->b', dv, jnp.einsum(
        'bij,bj->bi', M, dv)) + jnp.sum(
            constraint._cost_rows_cone(jar, *cone_args), axis=-1)

  timeit('cost eval', jax.jit(cost_of), x, jar)

  # solver iteration distribution on these states
  Dc = jax.jit(lambda DD: constraint.fwd_constraint_batched(model, DD))(D)
  ni = np.asarray(Dc.solver_niter)
  print(f'{"solver_niter":40s} {ni.max():6d} (max)')


if __name__ == '__main__':
  main()
