"""Small quaternion helpers mirroring the reference's mujoco/math.py
(reference dm_control/mujoco/math.py:23-66), implemented in numpy —
these are host-side conveniences used by mocap conversion, not the
device compute path (that lives in ops/math.py).

Quaternions are wxyz. `euler2quat` takes DEGREES and composes in zyx
order, matching the reference contract exactly.
"""

from __future__ import annotations

import numpy as np


def euler2quat(ax, ay, az):
  """Euler angles in degrees (roll ax, pitch ay, yaw az), zyx order."""
  hz, hy, hx = (np.deg2rad(az) / 2, np.deg2rad(ay) / 2,
                np.deg2rad(ax) / 2)
  cz, sz = np.cos(hz), np.sin(hz)
  cy, sy = np.cos(hy), np.sin(hy)
  cx, sx = np.cos(hx), np.sin(hx)
  return np.array([
      cz * cy * cx + sz * sy * sx,
      cz * cy * sx - sz * sy * cx,
      cz * sy * cx + sz * cy * sx,
      sz * cy * cx - cz * sy * sx,
  ])


def mj_quatprod(q, r):
  """Hamilton product q ⊗ r (wxyz)."""
  qw, qx, qy, qz = q
  rw, rx, ry, rz = r
  return np.array([
      qw * rw - qx * rx - qy * ry - qz * rz,
      qw * rx + qx * rw + qy * rz - qz * ry,
      qw * ry - qx * rz + qy * rw + qz * rx,
      qw * rz + qx * ry - qy * rx + qz * rw,
  ])


def mj_quat2vel(q, dt):
  """Angular velocity that rotates identity to `q` over `dt` seconds
  (axis-angle over dt; mirrors mju_quat2Vel)."""
  q = np.asarray(q, dtype=float)
  sin_half = np.linalg.norm(q[1:])
  if sin_half < 1e-14:
    return np.zeros(3)
  axis = q[1:] / sin_half
  angle = 2.0 * np.arctan2(sin_half, q[0])
  # wrap to [-pi, pi] so tiny negative rotations don't read as ~2*pi
  if angle > np.pi:
    angle -= 2.0 * np.pi
  return axis * (angle / dt)


def mj_quatneg(q):
  """Conjugate (inverse for unit quaternions)."""
  q = np.asarray(q, dtype=float)
  return np.array([q[0], -q[1], -q[2], -q[3]])


def mj_quatdiff(source, target):
  """Quaternion rotating `source` into `target`: source^-1 ⊗ target."""
  return mj_quatprod(mj_quatneg(source), np.asarray(target, dtype=float))
