"""Quaternion / rotation / spatial-algebra primitives for the TPU engine.

Everything here is pure jax.numpy, shape-static, and safe under vmap/jit.

Conventions (matching the MuJoCo model format semantics that the rest of the
stack compiles from — see reference dm_control/utils/transformations.py for the
behavioural contract, re-derived here from first principles):
  * quaternions are (w, x, y, z), unit norm;
  * rotation matrices are world_from_local;
  * spatial (6D) motion vectors are [angular(3); linear(3)];
  * spatial force vectors are [torque(3); force(3)].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternions
# ---------------------------------------------------------------------------


def mul_quat(q1: jax.Array, q2: jax.Array) -> jax.Array:
  """Hamilton product q1 * q2 (applies q2's rotation first)."""
  w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
  w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
  return jnp.stack(
      [
          w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
          w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
          w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
          w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
      ],
      axis=-1,
  )


def neg_quat(q: jax.Array) -> jax.Array:
  """Conjugate (inverse for unit quats)."""
  return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def rot_vec_quat(v: jax.Array, q: jax.Array) -> jax.Array:
  """Rotate vector v by quaternion q (world = R(q) @ v_local)."""
  w = q[..., 0:1]
  u = q[..., 1:4]
  # v' = v + 2w (u x v) + 2 u x (u x v)
  uv = jnp.cross(u, v)
  return v + 2.0 * (w * uv + jnp.cross(u, uv))


def rot_vec_quat_inv(v: jax.Array, q: jax.Array) -> jax.Array:
  """Rotate v by the inverse of q (local = R(q)^T @ v_world)."""
  return rot_vec_quat(v, neg_quat(q))


def quat_to_mat(q: jax.Array) -> jax.Array:
  """Quaternion -> 3x3 rotation matrix, supports leading batch dims."""
  w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
  xx, yy, zz = x * x, y * y, z * z
  xy, xz, yz = x * y, x * z, y * z
  wx, wy, wz = w * x, w * y, w * z
  m = jnp.stack(
      [
          1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
          2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
          2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
      ],
      axis=-1,
  )
  return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jax.Array) -> jax.Array:
  """3x3 rotation matrix -> unit quaternion (w,x,y,z); branch-free."""
  # Shepperd's method, computed via all four candidates and a select.
  tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
  qw = jnp.stack([
      1.0 + tr,
      m[..., 2, 1] - m[..., 1, 2],
      m[..., 0, 2] - m[..., 2, 0],
      m[..., 1, 0] - m[..., 0, 1],
  ], -1)
  qx = jnp.stack([
      m[..., 2, 1] - m[..., 1, 2],
      1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2],
      m[..., 0, 1] + m[..., 1, 0],
      m[..., 0, 2] + m[..., 2, 0],
  ], -1)
  qy = jnp.stack([
      m[..., 0, 2] - m[..., 2, 0],
      m[..., 0, 1] + m[..., 1, 0],
      1.0 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2],
      m[..., 1, 2] + m[..., 2, 1],
  ], -1)
  qz = jnp.stack([
      m[..., 1, 0] - m[..., 0, 1],
      m[..., 0, 2] + m[..., 2, 0],
      m[..., 1, 2] + m[..., 2, 1],
      1.0 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2],
  ], -1)
  cands = jnp.stack([qw, qx, qy, qz], -2)  # (..., 4, 4)
  scores = jnp.stack([
      1.0 + tr,
      1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2],
      1.0 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2],
      1.0 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2],
  ], -1)
  best = jnp.argmax(scores, axis=-1)
  q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), -2)
  q = q[..., 0, :]
  return normalize_quat(q)


def normalize_quat(q: jax.Array, eps: float = 1e-12) -> jax.Array:
  n = jnp.linalg.norm(q, axis=-1, keepdims=True)
  q = q / jnp.maximum(n, eps)
  # canonical: w >= 0 is NOT enforced (MuJoCo keeps raw sign); just unit norm.
  return q


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
  """Unit axis + angle -> quaternion."""
  half = 0.5 * angle
  s = jnp.sin(half)
  return jnp.concatenate(
      [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
  )


def quat_integrate(q: jax.Array, omega: jax.Array, dt) -> jax.Array:
  """Integrate quaternion by local-frame angular velocity omega over dt.

  Matches mju_quatIntegrate: q <- q * exp(0.5 * omega_local * dt).
  """
  angle = jnp.linalg.norm(omega, axis=-1, keepdims=True)
  safe = jnp.where(angle < 1e-12, 1.0, angle)
  axis = omega / safe
  half = 0.5 * angle[..., 0] * dt
  dq = jnp.concatenate(
      [jnp.cos(half)[..., None], axis * jnp.sin(half)[..., None]], axis=-1
  )
  dq = jnp.where(angle < 1e-12,
                 jnp.array([1.0, 0, 0, 0], dtype=q.dtype) +
                 jnp.pad(omega, [(0, 0)] * (omega.ndim - 1) + [(1, 0)]) *
                 (0.5 * dt),
                 dq)
  return normalize_quat(mul_quat(q, dq))


def quat_sub(qa: jax.Array, qb: jax.Array) -> jax.Array:
  """Velocity-space difference: 3D rotation vector v with qa = qb*exp(v/2).

  Matches mju_subQuat (result expressed in the *b/local* frame).
  """
  qdif = mul_quat(neg_quat(qb), qa)
  return quat_to_vel(qdif)


def quat_to_vel(q: jax.Array) -> jax.Array:
  """Convert quaternion (assumed unit) to 3D rotation (axis*angle) vector."""
  sin_half = jnp.linalg.norm(q[..., 1:4], axis=-1, keepdims=True)
  # angle in [0, 2pi); remap to (-pi, pi] by sign of w
  angle = 2.0 * jnp.arctan2(sin_half[..., 0], q[..., 0])
  angle = jnp.where(angle > jnp.pi, angle - 2.0 * jnp.pi, angle)
  axis = q[..., 1:4] / jnp.maximum(sin_half, 1e-12)
  return jnp.where(sin_half < 1e-12, 2.0 * q[..., 1:4], axis * angle[..., None])


# ---------------------------------------------------------------------------
# Spatial algebra (6D, [angular; linear])
# ---------------------------------------------------------------------------


def cross_motion(v: jax.Array, m: jax.Array) -> jax.Array:
  """Spatial motion cross product  v x m  (mju_crossMotion semantics)."""
  vang, vlin = v[..., :3], v[..., 3:]
  mang, mlin = m[..., :3], m[..., 3:]
  return jnp.concatenate(
      [jnp.cross(vang, mang), jnp.cross(vang, mlin) + jnp.cross(vlin, mang)],
      axis=-1,
  )


def cross_force(v: jax.Array, f: jax.Array) -> jax.Array:
  """Spatial force cross product  v x* f  (mju_crossForce semantics)."""
  vang, vlin = v[..., :3], v[..., 3:]
  fang, flin = f[..., :3], f[..., 3:]
  return jnp.concatenate(
      [jnp.cross(vang, fang) + jnp.cross(vlin, flin), jnp.cross(vang, flin)],
      axis=-1,
  )


def skew(v: jax.Array) -> jax.Array:
  """3-vector -> skew-symmetric matrix so that skew(v) @ u == v x u."""
  x, y, z = v[..., 0], v[..., 1], v[..., 2]
  zero = jnp.zeros_like(x)
  m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
  return m.reshape(v.shape[:-1] + (3, 3))


def spatial_inertia(mass: jax.Array, inertia_mat: jax.Array,
                    offset: jax.Array) -> jax.Array:
  """6x6 spatial inertia of a body at a frame displaced by `offset` from com.

  Args:
    mass: (...,) body mass.
    inertia_mat: (..., 3, 3) rotational inertia about the body com, expressed
      in the target frame's axes (world axes for the com-frame usage).
    offset: (..., 3) vector from the frame origin to the body com.

  Returns:
    (..., 6, 6) matrix mapping motion [w; v] -> force [tau; f].
  """
  cx = skew(offset)
  m = mass[..., None, None]
  eye = jnp.broadcast_to(jnp.eye(3, dtype=offset.dtype), cx.shape)
  # cx cx^T spelled as a multiply-reduce, not `@`: tiny-matmul dots
  # force (4,128)-tiled layouts + bf16 MXU round trips on TPU
  cxcxt = jnp.sum(cx[..., :, None, :] * cx[..., None, :, :], axis=-1)
  top_left = inertia_mat + m * cxcxt
  top_right = m * cx
  bot_left = m * cx.swapaxes(-1, -2)
  bot_right = m * eye
  top = jnp.concatenate([top_left, top_right], axis=-1)
  bot = jnp.concatenate([bot_left, bot_right], axis=-1)
  return jnp.concatenate([top, bot], axis=-2)


# ---------------------------------------------------------------------------
# Misc small helpers
# ---------------------------------------------------------------------------


def normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
  return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def make_frame(normal: jax.Array) -> jax.Array:
  """Build a right-handed 3x3 frame whose FIRST ROW is `normal`.

  Rows are [normal; tangent1; tangent2]. tangent1 is the projection of
  the world axis least aligned with the normal (this matches the oracle
  engine's frame construction, which matters for pyramidal friction:
  the pyramid directions follow the tangents).
  """
  n = normalize(normal)
  # candidate tangent: world-y when the normal is not aligned with it,
  # world-z otherwise (the oracle engine's mju_makeFrame convention:
  # if |n_y| < 0.5 pick (0,1,0) else (0,0,1))
  ey = jnp.zeros_like(n).at[..., 1].set(1.0)
  ez = jnp.zeros_like(n).at[..., 2].set(1.0)
  cand = jnp.where((jnp.abs(n[..., 1:2]) < 0.5), ey, ez)
  t1 = normalize(cand - n * jnp.sum(cand * n, axis=-1, keepdims=True))
  t2 = jnp.cross(n, t1)
  return jnp.stack([n, t1, t2], axis=-2)


def closest_segment_point(a: jax.Array, b: jax.Array,
                          p: jax.Array) -> jax.Array:
  """Closest point on segment [a, b] to point p."""
  ab = b - a
  denom = jnp.sum(ab * ab, axis=-1, keepdims=True)
  t = jnp.sum((p - a) * ab, axis=-1, keepdims=True) / jnp.maximum(denom, 1e-12)
  t = jnp.clip(t, 0.0, 1.0)
  return a + t * ab


def closest_segment_segment(p1: jax.Array, q1: jax.Array, p2: jax.Array,
                            q2: jax.Array):
  """Closest points between segments [p1,q1] and [p2,q2].

  Returns (c1, c2). Branch-free clamped quadratic solve.
  """
  d1 = q1 - p1
  d2 = q2 - p2
  r = p1 - p2
  a = jnp.sum(d1 * d1, -1)
  e = jnp.sum(d2 * d2, -1)
  f = jnp.sum(d2 * r, -1)
  c = jnp.sum(d1 * r, -1)
  b = jnp.sum(d1 * d2, -1)
  denom = a * e - b * b
  # initial s on infinite lines, clamped
  s = jnp.where(denom > 1e-12, jnp.clip((b * f - c * e) / jnp.maximum(
      denom, 1e-12), 0.0, 1.0), 0.0)
  t = (b * s + f) / jnp.maximum(e, 1e-12)
  # clamp t, recompute s
  t_cl = jnp.clip(t, 0.0, 1.0)
  s = jnp.clip((b * t_cl - c) / jnp.maximum(a, 1e-12), 0.0, 1.0)
  c1 = p1 + d1 * s[..., None]
  c2 = p2 + d2 * t_cl[..., None]
  return c1, c2
