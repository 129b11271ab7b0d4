"""Rigid-body transformation utilities (jnp-native, numpy-compatible).

Behavioural counterpart of reference dm_control/utils/transformations.py
(:26-659): quaternion / euler / rotation-matrix / axis-angle conversions
and homogeneous transforms. All functions accept numpy or jax arrays and
are safe to trace.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dm_control_tpu.ops import math as mops

# ---------------------------------------------------------------------------
# quaternions (w, x, y, z)
# ---------------------------------------------------------------------------


def quat_conj(quat):
  """Conjugate of quaternion."""
  quat = jnp.asarray(quat)
  return quat * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=quat.dtype)


def quat_inv(quat):
  """Inverse of (possibly non-unit) quaternion."""
  quat = jnp.asarray(quat)
  return quat_conj(quat) / jnp.sum(quat * quat, axis=-1, keepdims=True)


def quat_mul(quat1, quat2):
  """Hamilton product."""
  return mops.mul_quat(jnp.asarray(quat1), jnp.asarray(quat2))


def quat_diff(source, target):
  """Quaternion rotating `source` into `target` (source^-1 * target)."""
  return quat_mul(quat_conj(source), target)


def quat_log(quat, tol=1e-10):
  """Log of a unit quaternion: (0, theta*axis/2)."""
  quat = jnp.asarray(quat)
  q_norm = jnp.linalg.norm(quat[..., 1:4], axis=-1, keepdims=True)
  a = quat[..., 0:1]
  angle = jnp.arctan2(q_norm[..., 0], a[..., 0])
  axis = quat[..., 1:4] / jnp.maximum(q_norm, tol)
  out = jnp.concatenate(
      [jnp.zeros_like(a), axis * angle[..., None]], axis=-1)
  return jnp.where(q_norm < tol,
                   jnp.concatenate([jnp.zeros_like(a), quat[..., 1:4]],
                                   axis=-1),
                   out)


def quat_dist(source, target):
  """Angular distance between two unit quaternions, in [0, pi]."""
  source = jnp.asarray(source)
  target = jnp.asarray(target)
  dot = jnp.abs(jnp.sum(source * target, axis=-1))
  dot = jnp.clip(dot / (jnp.linalg.norm(source, axis=-1) *
                        jnp.linalg.norm(target, axis=-1)), -1.0, 1.0)
  return 2.0 * jnp.arccos(dot)


def quat_rotate(quat, vec):
  """Rotate vec by quat."""
  return mops.rot_vec_quat(jnp.asarray(vec), jnp.asarray(quat))


def quat_to_axisangle(quat):
  """Unit quaternion -> 3-vector axis * angle (angle in (-pi, pi])."""
  return mops.quat_to_vel(jnp.asarray(quat))


def axisangle_to_quat(axisangle):
  """3-vector axis*angle -> unit quaternion."""
  axisangle = jnp.asarray(axisangle)
  angle = jnp.linalg.norm(axisangle, axis=-1)
  axis = axisangle / jnp.maximum(angle, 1e-12)[..., None]
  return mops.axis_angle_to_quat(axis, angle)


def quat_to_mat(quat):
  """Quaternion -> 4x4 homogeneous rotation matrix."""
  m = mops.quat_to_mat(jnp.asarray(quat))
  out = jnp.eye(4, dtype=m.dtype)
  return out.at[:3, :3].set(m)


def quat_to_rmat(quat):
  """Quaternion -> 3x3 rotation matrix."""
  return mops.quat_to_mat(jnp.asarray(quat))


def mat_to_quat(mat):
  """3x3 or 4x4 rotation matrix -> unit quaternion."""
  mat = jnp.asarray(mat)
  return mops.mat_to_quat(mat[..., :3, :3])


# ---------------------------------------------------------------------------
# euler (radians)
# ---------------------------------------------------------------------------

_AXES = {'X': jnp.array([1.0, 0, 0]), 'Y': jnp.array([0, 1.0, 0]),
         'Z': jnp.array([0, 0, 1.0])}


def euler_to_quat(euler_vec, ordering='XYZ'):
  """Euler angles -> quaternion.

  Uppercase ordering letters denote intrinsic rotations (each about the
  newly rotated frame), matching the reference library's default 'XYZ'.
  """
  euler_vec = jnp.asarray(euler_vec)
  q = jnp.array([1.0, 0, 0, 0], dtype=euler_vec.dtype)
  for ch, ang in zip(ordering, [euler_vec[..., i] for i in range(3)]):
    r = mops.axis_angle_to_quat(
        _AXES[ch.upper()].astype(euler_vec.dtype), ang)
    if ch.isupper():
      q = mops.mul_quat(q, r)     # intrinsic
    else:
      q = mops.mul_quat(r, q)     # extrinsic
  return q


def euler_to_rmat(euler_vec, ordering='XYZ', full=False):
  """Euler angles -> rotation matrix (3x3, or 4x4 if full)."""
  r = mops.quat_to_mat(euler_to_quat(euler_vec, ordering))
  if not full:
    return r
  out = jnp.eye(4, dtype=r.dtype)
  return out.at[:3, :3].set(r)


def rmat_to_euler(rmat, ordering='XYZ'):
  """Rotation matrix -> euler angles for the common orderings."""
  rmat = jnp.asarray(rmat)[..., :3, :3]
  if ordering == 'XYZ':
    # intrinsic X-Y-Z
    ey = jnp.arcsin(jnp.clip(rmat[..., 0, 2], -1.0, 1.0))
    ex = jnp.arctan2(-rmat[..., 1, 2], rmat[..., 2, 2])
    ez = jnp.arctan2(-rmat[..., 0, 1], rmat[..., 0, 0])
    return jnp.stack([ex, ey, ez], axis=-1)
  if ordering == 'ZYX':
    ey = jnp.arcsin(jnp.clip(-rmat[..., 2, 0], -1.0, 1.0))
    ez = jnp.arctan2(rmat[..., 1, 0], rmat[..., 0, 0])
    ex = jnp.arctan2(rmat[..., 2, 1], rmat[..., 2, 2])
    return jnp.stack([ez, ey, ex], axis=-1)
  if ordering == 'XYZ_extrinsic' or ordering == 'xyz':
    return rmat_to_euler(rmat.swapaxes(-1, -2), 'ZYX')[..., ::-1]
  raise NotImplementedError(f'ordering {ordering}')


def quat_to_euler(quat, ordering='XYZ'):
  return rmat_to_euler(mops.quat_to_mat(jnp.asarray(quat)), ordering)


# ---------------------------------------------------------------------------
# homogeneous transforms
# ---------------------------------------------------------------------------


def pos_quat_to_hmat(pos, quat):
  """Position + quaternion -> 4x4 homogeneous matrix."""
  pos = jnp.asarray(pos)
  r = mops.quat_to_mat(jnp.asarray(quat))
  out = jnp.eye(4, dtype=r.dtype)
  out = out.at[:3, :3].set(r)
  return out.at[:3, 3].set(pos)


def hmat_to_pos_quat(hmat):
  hmat = jnp.asarray(hmat)
  return hmat[..., :3, 3], mops.mat_to_quat(hmat[..., :3, :3])


def hmat_inv(hmat):
  """Inverse of a rigid homogeneous transform."""
  hmat = jnp.asarray(hmat)
  r = hmat[..., :3, :3]
  p = hmat[..., :3, 3]
  rt = r.swapaxes(-1, -2)
  out = jnp.eye(4, dtype=hmat.dtype)
  out = out.at[:3, :3].set(rt)
  return out.at[:3, 3].set(-(rt @ p[..., None])[..., 0])


def rotation_x_axis(angle):
  return euler_to_rmat(jnp.stack(
      [jnp.asarray(angle), jnp.zeros_like(jnp.asarray(angle)),
       jnp.zeros_like(jnp.asarray(angle))], axis=-1))


def rotation_y_axis(angle):
  a = jnp.asarray(angle)
  return euler_to_rmat(jnp.stack(
      [jnp.zeros_like(a), a, jnp.zeros_like(a)], axis=-1))


def rotation_z_axis(angle):
  a = jnp.asarray(angle)
  return euler_to_rmat(jnp.stack(
      [jnp.zeros_like(a), jnp.zeros_like(a), a], axis=-1))


def cross_mat_from_vec3(v):
  """Skew-symmetric cross-product matrix."""
  return mops.skew(jnp.asarray(v))
