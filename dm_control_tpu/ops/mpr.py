"""Convex-convex narrowphase via Minkowski Portal Refinement (MPR).

The C engine routes every convex pair without a specialized analytic
kernel (ellipsoid-cylinder, box-cylinder, anything involving a mesh,
...) through libccd's MPR (reference consumer: the suite dog domain's
teeth/ball/target contacts and the Jaco arm's mesh geoms, loaded through
dm_control/mujoco/engine.py). This is the TPU-native equivalent: the
portal discovery and refinement loops run a FIXED number of iterations
with done-masking (no data-dependent control flow), so one kernel jits
once and vmaps over all candidate pairs of a type signature.

Shapes are described by support functions; convex mesh hulls use a
padded vertex array (argmax of one matvec — MXU-friendly). Witness
points are carried with every Minkowski-difference vertex so the contact
position comes from barycentric interpolation on the final portal.

Contact margin is handled by inflating both supports by margin/2 along
the query direction: the inflated shapes touch exactly when
dist < margin, which reproduces the activation semantics of the C
narrowphase (contact added when dist < margin) without a separate
distance query for separated shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.models import constants

_G = constants.GeomType
_BIG = 1e10

_DISCOVERY_ITERS = 12
_REFINE_ITERS = 24


def _support_local(gtype: int, size, verts, d):
  """Support point of one geom in its local frame for local direction d."""
  eps = 1e-12
  if gtype == _G.SPHERE:
    dn = d / jnp.maximum(jnp.linalg.norm(d), eps)
    return size[0] * dn
  if gtype == _G.CAPSULE:
    dn = d / jnp.maximum(jnp.linalg.norm(d), eps)
    cap = jnp.array([0.0, 0.0, 1.0], dtype=d.dtype) * (
        jnp.sign(d[2]) * size[1])
    return size[0] * dn + cap
  if gtype == _G.ELLIPSOID:
    w = size[:3] * d
    wn = jnp.linalg.norm(w)
    return size[:3] * w / jnp.maximum(wn, eps)
  if gtype == _G.CYLINDER:
    rxy = jnp.linalg.norm(d[:2])
    radial = jnp.where(rxy > eps, size[0] * d[:2] / jnp.maximum(rxy, eps),
                       jnp.zeros(2, dtype=d.dtype))
    return jnp.array([radial[0], radial[1],
                      jnp.sign(d[2]) * size[1]], dtype=d.dtype)
  if gtype == _G.BOX:
    return jnp.sign(d) * size[:3]
  if gtype == _G.MESH:
    idx = jnp.argmax(verts @ d)
    return verts[idx]
  raise NotImplementedError(f'support function for geom type {gtype}')


def make_kernel(t1: int, t2: int):
  """Build an MPR narrowphase fn for a static geom-type pair.

  Returned fn(p1, m1, s1, V1, p2, m2, s2, V2, margin) ->
  (dist (1,), pos (1, 3), n (1, 3)) with the module-wide convention:
  normal from geom1 to geom2, dist < 0 penetrating. V* are padded hull
  vertex arrays (ignored for non-mesh geoms).
  """

  def kernel(p1, m1, s1, V1, p2, m2, s2, V2, margin):
    dtype = p1.dtype
    eps = jnp.asarray(1e-12, dtype)
    infl = 0.5 * jnp.maximum(margin, 0.0).astype(dtype)

    def sup_pair(d):
      """Minkowski vertex v = b - a for world direction d = support_M dir.

      M = (geom2 (-) geom1): support_M(d) = sup2(d) - sup1(-d).
      Both supports inflated by margin/2 along their query direction.
      """
      dn = d / jnp.maximum(jnp.linalg.norm(d), eps)
      a = p1 + m1 @ _support_local(t1, s1, V1, m1.T @ (-dn)) - infl * dn
      b = p2 + m2 @ _support_local(t2, s2, V2, m2.T @ dn) + infl * dn
      return b - a, a, b

    # interior points (geometric centers)
    c1, c2 = p1, p2
    v0 = c2 - c1
    # deep-overlap degeneracy: centers coincide -> perturb
    v0 = jnp.where(jnp.linalg.norm(v0) < 1e-9,
                   jnp.array([1e-5, 2e-5, 3e-5], dtype), v0)

    # ---------------- portal discovery ----------------
    v1, a1, b1 = sup_pair(-v0)
    miss = jnp.dot(v1, -v0) <= 0

    d2 = jnp.cross(v1, v0)
    # origin on the v0-v1 line: nudge the second direction
    d2 = jnp.where(jnp.linalg.norm(d2) < 1e-10,
                   jnp.cross(v1 - v0, jnp.array([0.577, 0.577, 0.577],
                                                dtype)), d2)
    v2, a2, b2 = sup_pair(d2)
    miss |= jnp.dot(v2, d2) <= 0

    n = jnp.cross(v1 - v0, v2 - v0)
    swap = jnp.dot(n, v0) > 0
    v1, v2 = jnp.where(swap, v2, v1), jnp.where(swap, v1, v2)
    a1, a2 = jnp.where(swap, a2, a1), jnp.where(swap, a1, a2)
    b1, b2 = jnp.where(swap, b2, b1), jnp.where(swap, b1, b2)
    n = jnp.where(swap, -n, n)

    def discovery(_, carry):
      v1, v2, a1, a2, b1, b2, n, miss, done = carry
      v3, a3, b3 = sup_pair(n)
      miss_i = jnp.dot(v3, n) <= 0
      # origin outside plane (v0, v1, v3): rotate v2 <- v3
      out1 = jnp.dot(jnp.cross(v1, v3), v0) < 0
      # origin outside plane (v0, v3, v2): rotate v1 <- v3
      out2 = jnp.dot(jnp.cross(v3, v2), v0) < 0
      found = ~(out1 | out2)
      upd = ~done & ~miss_i
      nv2 = jnp.where(upd & out1, v3, v2)
      na2 = jnp.where(upd & out1, a3, a2)
      nb2 = jnp.where(upd & out1, b3, b2)
      nv1 = jnp.where(upd & ~out1 & out2, v3, v1)
      na1 = jnp.where(upd & ~out1 & out2, a3, a1)
      nb1 = jnp.where(upd & ~out1 & out2, b3, b1)
      nn = jnp.where(upd & ~found,
                     jnp.cross(nv1 - v0, nv2 - v0), n)
      return (nv1, nv2, na1, na2, nb1, nb2, nn,
              miss | (~done & miss_i), done | found | miss_i)

    v1, v2, a1, a2, b1, b2, n, miss, _ = jax.lax.fori_loop(
        0, _DISCOVERY_ITERS, discovery,
        (v1, v2, a1, a2, b1, b2, n, miss, miss))
    v3, a3, b3 = sup_pair(n)
    miss |= jnp.dot(v3, n) <= 0

    # ---------------- portal refinement ----------------
    def refine(_, carry):
      v1, v2, v3, a1, a2, a3, b1, b2, b3, done = carry
      pn = jnp.cross(v2 - v1, v3 - v1)
      pn = pn / jnp.maximum(jnp.linalg.norm(pn), eps)
      v4, a4, b4 = sup_pair(pn)
      conv = jnp.dot(v4 - v3, pn) < 1e-7
      # wedge test: which portal vertex does v4 replace so the v0-origin
      # ray stays inside the new portal
      t1c = jnp.dot(jnp.cross(v4, v1), v0) < 0
      t2c = jnp.dot(jnp.cross(v4, v2), v0) < 0
      t3c = jnp.dot(jnp.cross(v4, v3), v0) < 0
      rep1 = (t1c & t2c) | (~t1c & ~t3c)
      rep2 = ~t1c & t3c
      rep3 = t1c & ~t2c
      upd = ~done & ~conv
      nv1 = jnp.where(upd & rep1, v4, v1)
      nv2 = jnp.where(upd & rep2, v4, v2)
      nv3 = jnp.where(upd & rep3, v4, v3)
      na1 = jnp.where(upd & rep1, a4, a1)
      na2 = jnp.where(upd & rep2, a4, a2)
      na3 = jnp.where(upd & rep3, a4, a3)
      nb1 = jnp.where(upd & rep1, b4, b1)
      nb2 = jnp.where(upd & rep2, b4, b2)
      nb3 = jnp.where(upd & rep3, b4, b3)
      return (nv1, nv2, nv3, na1, na2, na3, nb1, nb2, nb3, done | conv)

    v1, v2, v3, a1, a2, a3, b1, b2, b3, _ = jax.lax.fori_loop(
        0, _REFINE_ITERS, refine,
        (v1, v2, v3, a1, a2, a3, b1, b2, b3, miss))

    pn = jnp.cross(v2 - v1, v3 - v1)
    pn = pn / jnp.maximum(jnp.linalg.norm(pn), eps)
    # penetration depth of the INFLATED shapes along the portal normal
    depth = jnp.dot(v1, pn)
    hit = ~miss & (depth >= 0)

    # witness points: origin projected on the portal, barycentric mix
    p0 = pn * depth
    w1 = jnp.dot(jnp.cross(v2 - p0, v3 - p0), pn)
    w2 = jnp.dot(jnp.cross(v3 - p0, v1 - p0), pn)
    w3 = jnp.dot(jnp.cross(v1 - p0, v2 - p0), pn)
    w = jnp.maximum(jnp.stack([w1, w2, w3]), 0.0)
    wsum = jnp.sum(w)
    w = jnp.where(wsum > 1e-14, w / jnp.maximum(wsum, 1e-14),
                  jnp.full(3, 1.0 / 3.0, dtype))
    pa = w[0] * a1 + w[1] * a2 + w[2] * a3
    pb = w[0] * b1 + w[1] * b2 + w[2] * b3
    pos = 0.5 * (pa + pb)

    # portal normal points (geom2 - geom1)-outward along the v0 ray, i.e.
    # from geom2 toward geom1; flip for the g1 -> g2 convention
    n_out = -pn
    dist = margin - depth            # true distance (margin-inflated MPR)
    dist = jnp.where(hit, dist, _BIG)
    return dist[None], pos[None], n_out[None]

  return kernel


def plane_convex_kernel(t2: int, k: int = 4):
  """Plane vs convex shape: the k deepest support/vertex points.

  For meshes this tests every hull vertex against the plane (one matvec)
  and keeps the k deepest — the behavioral contract of the C engine's
  plane-convex collider, which collects penetrating vertices.
  """

  def kernel(p1, m1, s1, V1, p2, m2, s2, V2, margin):
    del s1, V1
    n = m1[:, 2]
    if t2 == _G.MESH:
      pts = p2 + V2 @ m2.T                       # (V, 3) world verts
    else:
      # sample support points: straight down + 8 tilted directions
      dirs = [-n]
      f = _frame(n)
      for ang in (0.3, 0.6):
        for u in (f[1], -f[1], f[2], -f[2]):
          dirs.append(-(n * np.cos(ang) + 0.0) - u * np.sin(ang))
      pts = jnp.stack([
          p2 + m2 @ _support_local(t2, s2, V2, m2.T @ (d / jnp.linalg.norm(d)))
          for d in dirs])
    h = pts @ n - jnp.dot(p1, n)
    idx = jnp.argsort(h)[:k]
    hh = h[idx]
    pos = pts[idx] - n[None, :] * (hh * 0.5)[:, None]
    return hh, pos, jnp.tile(n, (k, 1))

  return kernel


def _frame(n):
  # host-side helper only used to pick sampling directions
  t = jnp.where(jnp.abs(n[0]) < 0.9,
                jnp.array([1.0, 0, 0], n.dtype),
                jnp.array([0.0, 1, 0], n.dtype))
  u = jnp.cross(n, t)
  u = u / jnp.linalg.norm(u)
  return n, u, jnp.cross(n, u)
