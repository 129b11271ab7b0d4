"""Rotation-valued variations (contract: reference
composer/variation/rotations.py). Quaternions are wxyz, matching
`dm_control_tpu.utils.transformations`. Factories over the Expr core."""

import numpy as np

from dm_control_tpu.composer.variation import _expr
from dm_control_tpu.utils import transformations

IDENTITY_QUATERNION = np.array([1.0, 0.0, 0.0, 0.0])


def UniformQuaternion():  # noqa: N802
  """Unit quaternion uniform over SO(3), via Shoemake's subgroup method."""
  def run(ctx):
    rng = ctx.random_state
    s = rng.uniform()
    phi, psi = rng.uniform(0.0, 2.0 * np.pi, size=2)
    w1, w2 = np.sqrt(1.0 - s), np.sqrt(s)
    return np.array([w1 * np.sin(phi), w1 * np.cos(phi),
                     w2 * np.sin(psi), w2 * np.cos(psi)])
  return _expr.Expr(run, label='uniform_quat')


def QuaternionFromAxisAngle(axis, angle):  # noqa: N802
  """Quaternion from (possibly varying) rotation axis and angle."""
  def run(ctx):
    ax = np.asarray(_expr.resolve(axis, ctx), dtype=float)
    return transformations.axisangle_to_quat(
        ax * _expr.resolve(angle, ctx))
  return _expr.Expr(run, label='axis_angle_quat')


def _anchor(ctx, cumulative):
  return ctx.current if cumulative else ctx.initial


def QuaternionPreMultiply(quat, cumulative=False):  # noqa: N802
  """Composes a generated quaternion onto the bound quaternion.

  With cumulative=True the anchor is the live value (rotations
  accumulate across evaluations); otherwise the episode-initial value.
  """
  def run(ctx):
    q = np.asarray(_expr.resolve(quat, ctx))
    return transformations.quat_mul(
        q, np.asarray(_anchor(ctx, cumulative)))
  return _expr.Expr(run, label='quat_premul')


def QuaternionRotate(quat, vec=None, cumulative=False):  # noqa: N802
  """Rotates a vector by a quaternion-valued variation.

  With vec=None the rotated vector is the bound value itself.
  """
  def run(ctx):
    q = np.asarray(_expr.resolve(quat, ctx))
    v = (_anchor(ctx, cumulative) if vec is None
         else _expr.resolve(vec, ctx))
    return transformations.quat_rotate(q, np.asarray(v))
  return _expr.Expr(run, label='quat_rotate')
