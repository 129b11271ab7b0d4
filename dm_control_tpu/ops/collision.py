"""Narrowphase collision into static contact slots.

The candidate pair list is a compile-time constant (broadphase is done by
the model compiler from contype/conaffinity and body-filter rules, mirroring
the behavioural contract of the engine the reference wraps). At trace time
candidates are grouped by geom-type signature and each group is evaluated
as one vmapped kernel, producing a fixed number of contact slots per pair.
Inactive slots are masked, never pruned — shapes stay static for XLA.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.models import constants
from dm_control_tpu.models.types import Data, Model
from dm_control_tpu.ops import math as mops

_G = constants.GeomType

_BIG = 1e10


# Each primitive function: (pos1, mat1, size1, pos2, mat2, size2) ->
#   (dist (K,), pos (K, 3), normal (K, 3)) with normal from geom1 to geom2.


def _plane_sphere(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  h = jnp.dot(n, p2 - p1)
  dist = h - s2[0]
  pos = p2 - n * (h + s2[0]) * 0.5
  return dist[None], pos[None], n[None]


def _plane_capsule(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  axis = m2[:, 2]
  r, half = s2[0], s2[1]
  ends = jnp.stack([p2 + axis * half, p2 - axis * half])
  h = ends @ n - jnp.dot(p1, n)
  dist = h - r
  pos = ends - n[None, :] * ((h + r) * 0.5)[:, None]
  return dist, pos, jnp.stack([n, n])


def _plane_box(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  # 8 corners
  signs = jnp.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                     for sz in (-1, 1)], dtype=p2.dtype)
  corners = p2 + (signs * s2[None, :3]) @ m2.T
  h = corners @ n - jnp.dot(p1, n)
  # four deepest corners
  idx = jnp.argsort(h)[:4]
  hh = h[idx]
  pos = corners[idx] - n[None, :] * (hh * 0.5)[:, None]
  return hh, pos, jnp.tile(n, (4, 1))


def _plane_cylinder(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  axis = m2[:, 2]
  r, half = s2[0], s2[1]
  # pick the end cap facing the plane
  sign = -jnp.sign(jnp.dot(n, axis) + 1e-12)
  center = p2 + axis * half * sign
  # rim direction: steepest descent along -n in the cap plane
  t = -(n - axis * jnp.dot(n, axis))
  tn = jnp.linalg.norm(t)
  t = jnp.where(tn > 1e-8, t / jnp.maximum(tn, 1e-12),
                mops.make_frame(axis)[1])
  u = jnp.cross(axis, t)
  pts = jnp.stack([center + r * t, center - r * t,
                   center + r * u, center - r * u])
  h = pts @ n - jnp.dot(p1, n)
  pos = pts - n[None, :] * (h * 0.5)[:, None]
  return h, pos, jnp.tile(n, (4, 1))


def _plane_ellipsoid(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  nl = m2.T @ n                     # plane normal in ellipsoid frame
  sn = s2 * nl
  support = jnp.linalg.norm(sn)
  # deepest point on the ellipsoid surface along -n
  local = -(s2 * sn) / jnp.maximum(support, 1e-12)
  point = p2 + m2 @ local
  h = jnp.dot(n, point - p1)
  pos = point - n * h * 0.5
  return h[None], pos[None], n[None]


def _sphere_sphere(p1, m1, s1, p2, m2, s2):
  dif = p2 - p1
  dist = jnp.linalg.norm(dif)
  n = dif / jnp.maximum(dist, 1e-12)
  n = jnp.where(dist < 1e-12, jnp.array([0.0, 0, 1], dtype=p1.dtype), n)
  pen = dist - s1[0] - s2[0]
  pos = p1 + n * (s1[0] + 0.5 * pen)
  return pen[None], pos[None], n[None]


def _sphere_capsule(p1, m1, s1, p2, m2, s2):
  axis = m2[:, 2]
  half = s2[1]
  seg_pt = mops.closest_segment_point(p2 - axis * half, p2 + axis * half,
                                      p1)
  return _sphere_sphere(p1, m1, s1, seg_pt, m2, s2)


def _sphere_cylinder(p1, m1, s1, p2, m2, s2):
  # approximate: clamp sphere center to the cylinder's solid volume
  local = m2.T @ (p1 - p2)
  r, half = s2[0], s2[1]
  rad = jnp.linalg.norm(local[:2])
  clamped_xy = local[:2] * jnp.minimum(1.0, r / jnp.maximum(rad, 1e-12))
  clamped = jnp.array([clamped_xy[0], clamped_xy[1],
                       jnp.clip(local[2], -half, half)])
  surf = p2 + m2 @ clamped
  dif = surf - p1
  dist = jnp.linalg.norm(dif)
  n = dif / jnp.maximum(dist, 1e-12)
  pen = dist - s1[0]
  pos = surf - n * 0.5 * pen
  return pen[None], pos[None], n[None]


def _sphere_box(p1, m1, s1, p2, m2, s2):
  local = m2.T @ (p1 - p2)
  clamped = jnp.clip(local, -s2[:3], s2[:3])
  inside = jnp.all(jnp.abs(local) < s2[:3])
  # if inside, push out through the nearest face
  gaps = s2[:3] - jnp.abs(local)
  ax = jnp.argmin(gaps)
  face = clamped.at[ax].set(jnp.sign(local[ax]) * s2[ax])
  surface_local = jnp.where(inside, face, clamped)
  surface = p2 + m2 @ surface_local
  dif = surface - p1
  dist = jnp.linalg.norm(dif)
  n_out = dif / jnp.maximum(dist, 1e-12)
  n = jnp.where(inside, -n_out, n_out)
  pen = jnp.where(inside, -dist - s1[0], dist - s1[0])
  pos = surface - n * 0.5 * pen
  return pen[None], pos[None], n[None]


def _capsule_capsule(p1, m1, s1, p2, m2, s2):
  a1, h1 = m1[:, 2], s1[1]
  a2, h2 = m2[:, 2], s2[1]
  c1, c2 = mops.closest_segment_segment(
      p1 - a1 * h1, p1 + a1 * h1, p2 - a2 * h2, p2 + a2 * h2)
  d0, pos0, n0 = _sphere_sphere(c1, m1, s1, c2, m2, s2)
  # second (inactive unless near-parallel deep) slot: midpoints projection
  c1b = mops.closest_segment_point(p1 - a1 * h1, p1 + a1 * h1, c2)
  mid1 = 0.5 * (c1 + p1)
  c2b = mops.closest_segment_point(p2 - a2 * h2, p2 + a2 * h2, mid1)
  c1c = mops.closest_segment_point(p1 - a1 * h1, p1 + a1 * h1, c2b)
  d1, pos1, n1 = _sphere_sphere(c1c, m1, s1, c2b, m2, s2)
  # suppress the second contact when it duplicates the first
  dup = jnp.linalg.norm(pos1[0] - pos0[0]) < 0.25 * (s1[0] + s2[0])
  d1 = jnp.where(dup, _BIG, d1)
  return (jnp.concatenate([d0, d1]), jnp.concatenate([pos0, pos1]),
          jnp.concatenate([n0, n1]))


def _capsule_box(p1, m1, s1, p2, m2, s2):
  # two sphere-box contacts at the capsule's closest interior points
  a1, h1 = m1[:, 2], s1[1]
  e1, e2 = p1 - a1 * h1, p1 + a1 * h1
  # clamp segment endpoints toward the box center to find support points
  local1 = m2.T @ (e1 - p2)
  local2 = m2.T @ (e2 - p2)
  d1 = jnp.linalg.norm(local1 / jnp.maximum(s2[:3], 1e-9), ord=jnp.inf)
  d2 = jnp.linalg.norm(local2 / jnp.maximum(s2[:3], 1e-9), ord=jnp.inf)
  da, posa, na = _sphere_box(e1, m1, s1, p2, m2, s2)
  db, posb, nb = _sphere_box(e2, m1, s1, p2, m2, s2)
  del d1, d2
  return (jnp.concatenate([da, db]), jnp.concatenate([posa, posb]),
          jnp.concatenate([na, nb]))


def _capsule_cylinder(p1, m1, s1, p2, m2, s2):
  # endpoint-sphere approximation
  a1, h1 = m1[:, 2], s1[1]
  da, posa, na = _sphere_cylinder(p1 - a1 * h1, m1, s1, p2, m2, s2)
  db, posb, nb = _sphere_cylinder(p1 + a1 * h1, m1, s1, p2, m2, s2)
  return (jnp.concatenate([da, db]), jnp.concatenate([posa, posb]),
          jnp.concatenate([na, nb]))


def _sphere_ellipsoid(p1, m1, s1, p2, m2, s2):
  # iterative projection would be exact; use scaled-space approximation
  local = m2.T @ (p1 - p2)
  scaled = local / jnp.maximum(s2[:3], 1e-12)
  nrm = jnp.linalg.norm(scaled)
  surf_local = local / jnp.maximum(nrm, 1e-12)
  surface = p2 + m2 @ surf_local
  dif = p1 - surface
  dist = jnp.linalg.norm(dif)
  outside = nrm > 1.0
  n = dif / jnp.maximum(dist, 1e-12) * jnp.where(outside, -1.0, 1.0)
  pen = jnp.where(outside, dist, -dist) - s1[0]
  pos = surface + n * 0.5 * (-pen)
  return pen[None], pos[None], -n[None]


def _box_box(p1, m1, s1, p2, m2, s2):
  """Box-box contacts: separating axes + face-patch sampling.

  Face contacts sample up to 8 candidate points (the incident face's
  corners clamped into the reference face rectangle, plus the reference
  face's corners inside the incident quad), with depths evaluated on
  the incident face plane; edge-edge contacts use segment closest
  points. This is an approximation of exact polygon clipping with
  identical behavior for (near-)aligned stacking.
  """
  dtype = p1.dtype
  a = s1[:3]
  b = s2[:3]
  eye = jnp.eye(3, dtype=dtype)
  c = m1.T @ m2                 # rotation taking B-frame vecs to A
  t = m1.T @ (p2 - p1)          # B center in A frame
  absc = jnp.abs(c) + 1e-9

  sep_a = jnp.abs(t) - (a + absc @ b)            # A face axes
  t_b = c.T @ t
  sep_b = jnp.abs(t_b) - (b + absc.T @ a)        # B face axes

  edge_seps, edge_axes = [], []
  for i in range(3):
    for j in range(3):
      axis = jnp.cross(eye[i], c[:, j])
      norm = jnp.linalg.norm(axis)
      ok = norm > 1e-6
      axis_n = axis / jnp.maximum(norm, 1e-12)
      ra = (a[(i + 1) % 3] * absc[(i + 2) % 3, j] +
            a[(i + 2) % 3] * absc[(i + 1) % 3, j]) / jnp.maximum(
                norm, 1e-12)
      rb = (b[(j + 1) % 3] * absc[i, (j + 2) % 3] +
            b[(j + 2) % 3] * absc[i, (j + 1) % 3]) / jnp.maximum(
                norm, 1e-12)
      sep = jnp.abs(t @ axis_n) - (ra + rb)
      edge_seps.append(jnp.where(ok, sep, -_BIG))
      edge_axes.append(axis_n)
  edge_seps = jnp.stack(edge_seps)
  edge_axes = jnp.stack(edge_axes)

  face_seps = jnp.concatenate([sep_a, sep_b])
  separated = jnp.maximum(jnp.max(face_seps),
                          jnp.max(edge_seps)) > 0
  best_face = jnp.argmax(face_seps)
  best_edge = jnp.argmax(edge_seps)
  # prefer face contacts unless an edge axis is clearly better
  use_edge = edge_seps[best_edge] > face_seps[best_face] + 1e-9

  a_is_ref = best_face < 3
  ref_idx = jnp.where(a_is_ref, best_face, best_face - 3)

  def face_contacts(ref_half, inc_half, rot_ri, t_ri, k, sign):
    """Reference box at origin; rot_ri: inc->ref; t_ri: inc center.

    k: reference face axis; sign: direction of the face normal
    (pointing toward the incident box). Returns (dist(8,), pos(8,3))
    in the reference frame.
    """
    u, v = (k + 1) % 3, (k + 2) % 3
    # incident face = inc axis most anti-parallel to the ref normal
    n_in_inc = sign * rot_ri[k, :]          # ref normal in inc frame
    inc_axis = jnp.argmax(jnp.abs(n_in_inc))
    inc_sign = -jnp.sign(n_in_inc)[inc_axis]
    e_inc = jnp.eye(3, dtype=dtype)
    onehot_inc = e_inc[inc_axis]
    fc_inc = inc_sign * inc_half[inc_axis] * onehot_inc
    iu = e_inc[(inc_axis + 1) % 3] * inc_half[(inc_axis + 1) % 3]
    iv = e_inc[(inc_axis + 2) % 3] * inc_half[(inc_axis + 2) % 3]
    quad_inc = jnp.stack([fc_inc + iu + iv, fc_inc - iu + iv,
                          fc_inc - iu - iv, fc_inc + iu - iv])
    quad = quad_inc @ rot_ri.T + t_ri       # (4,3) in ref frame

    # incident plane in the ref frame: w . x = w . q0
    w = rot_ri @ (inc_sign * onehot_inc)    # inward normal of inc face
    q0 = quad[0]
    wk = jnp.where(jnp.abs(w[k]) < 1e-8,
                   jnp.sign(w[k] + 1e-30) * 1e-8, w[k])

    def plane_coord(pu, pv):
      # x[k] on the incident plane at (x[u], x[v]) = (pu, pv)
      return (w @ q0 - w[u] * pu - w[v] * pv) / wk

    # candidates 0-3: incident corners clamped into the ref rectangle
    cu = jnp.clip(quad[:, u], -ref_half[u], ref_half[u])
    cv = jnp.clip(quad[:, v], -ref_half[v], ref_half[v])
    ck = plane_coord(cu, cv)
    cand_inc = jnp.stack([cu, cv, ck], axis=1)
    ok_inc = jnp.ones(4, dtype=bool)

    # candidates 4-7: ref-face corners inside the incident quad's
    # (u,v) projection
    ru = jnp.array([1.0, -1.0, -1.0, 1.0], dtype) * ref_half[u]
    rv = jnp.array([1.0, 1.0, -1.0, -1.0], dtype) * ref_half[v]
    rk = plane_coord(ru, rv)
    cand_ref = jnp.stack([ru, rv, rk], axis=1)
    # point-in-quad test in (u,v): all cross products same sign
    qu, qv = quad[:, u], quad[:, v]
    def inside(px, py):
      s = []
      for e in range(4):
        ex, ey = qu[(e + 1) % 4] - qu[e], qv[(e + 1) % 4] - qv[e]
        s.append(ex * (py - qv[e]) - ey * (px - qu[e]))
      s = jnp.stack(s, axis=-1)
      return (jnp.all(s >= -1e-9, axis=-1) |
              jnp.all(s <= 1e-9, axis=-1))
    ok_ref = inside(ru, rv)

    cands_uvk = jnp.concatenate([cand_inc, cand_ref])   # (8,3) u,v,k
    ok = jnp.concatenate([ok_inc, ok_ref])
    # assemble ref-frame points and depths
    pts = jnp.zeros((8, 3), dtype)
    pts = pts.at[:, u].set(cands_uvk[:, 0])
    pts = pts.at[:, v].set(cands_uvk[:, 1])
    pts = pts.at[:, k].set(cands_uvk[:, 2])
    depth = sign * pts[:, k] - ref_half[k]   # negative = penetrating
    dist = jnp.where(ok, depth, _BIG)
    # contact pos midway between the point and the ref face
    proj = pts.at[:, k].set(sign * ref_half[k])
    pos = 0.5 * (pts + proj)
    return dist, pos

  sign_a = jnp.sign(t[ref_idx] + 1e-30)
  dist_fa, pos_fa = face_contacts(a, b, c, t, ref_idx, sign_a)
  pos_fa_w = pos_fa @ m1.T + p1
  n_fa_w = m1 @ (sign_a * eye[ref_idx])

  sign_b = -jnp.sign(t_b[ref_idx] + 1e-30)
  dist_fb, pos_fb = face_contacts(b, a, c.T, -t_b, ref_idx, sign_b)
  pos_fb_w = pos_fb @ m2.T + p2
  n_fb_w = m2 @ (jnp.sign(t_b[ref_idx] + 1e-30) * eye[ref_idx])

  dist_face = jnp.where(a_is_ref, dist_fa, dist_fb)
  pos_face = jnp.where(a_is_ref, pos_fa_w, pos_fb_w)
  n_face = jnp.where(a_is_ref, n_fa_w, n_fb_w)

  # ---------------- edge-edge ----------------
  i_e = best_edge // 3
  j_e = best_edge % 3
  axis_e = edge_axes[best_edge]
  axis_e = axis_e * jnp.sign(axis_e @ t + 1e-30)   # point A->B
  onehot_i = eye[i_e]
  corner_a = jnp.where(jnp.arange(3) == i_e, 0.0,
                       jnp.sign(axis_e) * a)
  axis_e_b = c.T @ axis_e
  corner_b_bf = jnp.where(jnp.arange(3) == j_e, 0.0,
                          -jnp.sign(axis_e_b) * b)
  corner_b = c @ corner_b_bf + t
  dir_a = onehot_i
  dir_b = c[:, j_e]
  pa_e, pb_e = mops.closest_segment_segment(
      corner_a - dir_a * a[i_e], corner_a + dir_a * a[i_e],
      corner_b - dir_b * b[j_e], corner_b + dir_b * b[j_e])
  dist_edge = edge_seps[best_edge]
  pos_edge_w = (0.5 * (pa_e + pb_e)) @ m1.T + p1
  n_edge_w = m1 @ axis_e

  dist8 = jnp.where(use_edge,
                    jnp.full(8, _BIG, dtype).at[0].set(dist_edge),
                    dist_face)
  pos8 = jnp.where(use_edge,
                   jnp.zeros((8, 3), dtype).at[0].set(pos_edge_w),
                   pos_face)
  n8 = jnp.broadcast_to(jnp.where(use_edge, n_edge_w, n_face), (8, 3))
  dist8 = jnp.where(separated, jnp.full(8, _BIG, dtype), dist8)
  return dist8, pos8, n8


_FUNCS = {
    (_G.PLANE, _G.SPHERE): (_plane_sphere, 1),
    (_G.PLANE, _G.CAPSULE): (_plane_capsule, 2),
    (_G.PLANE, _G.ELLIPSOID): (_plane_ellipsoid, 1),
    (_G.PLANE, _G.CYLINDER): (_plane_cylinder, 4),
    (_G.PLANE, _G.BOX): (_plane_box, 4),
    (_G.SPHERE, _G.SPHERE): (_sphere_sphere, 1),
    (_G.SPHERE, _G.CAPSULE): (_sphere_capsule, 1),
    (_G.SPHERE, _G.ELLIPSOID): (_sphere_ellipsoid, 1),
    (_G.SPHERE, _G.CYLINDER): (_sphere_cylinder, 1),
    (_G.SPHERE, _G.BOX): (_sphere_box, 1),
    (_G.CAPSULE, _G.CAPSULE): (_capsule_capsule, 2),
    (_G.CAPSULE, _G.CYLINDER): (_capsule_cylinder, 2),
    (_G.CAPSULE, _G.BOX): (_capsule_box, 2),
    (_G.BOX, _G.BOX): (_box_box, 8),
}


# ---------------------------------------------------------------------------
# heightfield narrowphase
#
# The C engine collides geoms against the triangular prisms under their
# AABB (dynamic work per step). The TPU formulation treats the field as
# a smooth bilinear surface: sample height + gradient under candidate
# points, contact along the local surface normal. Exact for sphere-ish
# geoms on terrain whose features are larger than the geom (the
# reference's use case: randomized bowls/bumps, reference
# suite/quadruped.py Escape, locomotion/arenas/bowl.py), approximate at
# sharp cliffs.
# ---------------------------------------------------------------------------


def _hfield_surface(grid, nrow, ncol, rx, ry, ztop, pl):
  """Bilinear height and outward normal at local xy of one point."""
  dtype = pl.dtype
  u = (pl[0] + rx) / (2.0 * rx) * (ncol - 1)
  v = (pl[1] + ry) / (2.0 * ry) * (nrow - 1)
  iu = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, ncol - 2)
  iv = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, nrow - 2)
  fu = jnp.clip(u - iu, 0.0, 1.0)
  fv = jnp.clip(v - iv, 0.0, 1.0)
  h00 = grid[iv, iu]
  h01 = grid[iv, iu + 1]
  h10 = grid[iv + 1, iu]
  h11 = grid[iv + 1, iu + 1]
  h = ((1 - fv) * ((1 - fu) * h00 + fu * h01) +
       fv * ((1 - fu) * h10 + fu * h11)) * ztop
  dhdx = (((1 - fv) * (h01 - h00) + fv * (h11 - h10)) * ztop *
          (ncol - 1) / (2.0 * rx))
  dhdy = (((1 - fu) * (h10 - h00) + fu * (h11 - h01)) * ztop *
          (nrow - 1) / (2.0 * ry))
  n = jnp.stack([-dhdx, -dhdy, jnp.ones((), dtype)])
  n = n / jnp.linalg.norm(n)
  inside = (jnp.abs(pl[0]) <= rx) & (jnp.abs(pl[1]) <= ry)
  return h, n, inside


def _hfield_points(hpos, hmat, hsize, grid, nrow, ncol, points, radius):
  """Point-sphere contacts against the field. points (P, 3) world."""
  rx, ry, ztop = hsize[0], hsize[1], hsize[2]

  def one(p):
    pl = hmat.T @ (p - hpos)
    h, n_l, inside = _hfield_surface(grid, nrow, ncol, rx, ry, ztop, pl)
    dist = (pl[2] - h) * n_l[2] - radius
    dist = jnp.where(inside, dist, _BIG)
    pos_l = pl - n_l * (radius + 0.5 * dist)
    return dist, hpos + hmat @ pos_l, hmat @ n_l

  return jax.vmap(one)(points)


def _hfield_candidate(m: Model, d: Data, ci: int, dtype):
  """Contacts for one hfield candidate pair -> (dist(k,), pos, n)."""
  g_hf = m.cpair_geom1[ci]
  g2 = m.cpair_geom2[ci]
  t2 = m.geom_type[g2]
  hid = m.geom_dataid[g_hf]
  nrow, ncol = m.hfield_nrow[hid], m.hfield_ncol[hid]
  adr = m.hfield_adr[hid]
  grid = jnp.asarray(
      m.hfield_data[adr:adr + nrow * ncol], dtype).reshape(nrow, ncol)
  hsize = jnp.asarray(m.hfield_size[hid], dtype)
  hpos = d.geom_xpos[g_hf]
  hmat = d.geom_xmat[g_hf]
  p2 = d.geom_xpos[g2]
  m2 = d.geom_xmat[g2]
  s2 = jnp.asarray(m.geom_size)[g2].astype(dtype)
  if t2 == _G.SPHERE:
    return _hfield_points(hpos, hmat, hsize, grid, nrow, ncol,
                          p2[None], s2[0])
  if t2 == _G.CAPSULE:
    axis = m2[:, 2]
    ends = jnp.stack([p2 + axis * s2[1], p2 - axis * s2[1]])
    return _hfield_points(hpos, hmat, hsize, grid, nrow, ncol,
                          ends, s2[0])
  if t2 == _G.ELLIPSOID:
    return _hfield_points(hpos, hmat, hsize, grid, nrow, ncol,
                          p2[None], jnp.min(s2))
  if t2 == _G.BOX:
    signs = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                      for sz in (-1, 1)])
    corners = p2 + (jnp.asarray(signs, dtype) * s2[None, :3]) @ m2.T
    dd, pp, nn = _hfield_points(hpos, hmat, hsize, grid, nrow, ncol,
                                corners, jnp.zeros((), dtype))
    idx = jnp.argsort(dd)[:4]
    return dd[idx], pp[idx], nn[idx]
  if t2 == _G.CYLINDER:
    # sample both cap rims at 4 compass points each, keep the 4 deepest
    axis = m2[:, 2]
    t = mops.make_frame(axis)[1]
    u = jnp.cross(axis, t)
    r, half = s2[0], s2[1]
    caps = jnp.stack([p2 + axis * half, p2 - axis * half])   # (2, 3)
    offs = jnp.stack([r * t, -r * t, r * u, -r * u])         # (4, 3)
    pts = (caps[:, None, :] + offs[None, :, :]).reshape(8, 3)
    dd, pp, nn = _hfield_points(hpos, hmat, hsize, grid, nrow, ncol,
                                pts, jnp.zeros((), dtype))
    idx = jnp.argsort(dd)[:4]
    return dd[idx], pp[idx], nn[idx]
  raise NotImplementedError(
      f'hfield vs geom type {t2} has no narrowphase kernel')


def collision(m: Model, d: Data) -> Data:
  """Narrowphase over all candidate pairs, then contact compaction.

  When the model's compacted slot count (m.ncon_sel) is smaller than the
  full narrowphase slot count (m.ncon_max), the deepest ncon_sel
  contacts per condim group are selected each step (runtime top-K
  broadphase); `contact.overflow` flags steps that dropped active
  contacts. With no compaction the slot mapping is the identity.
  """
  ncand = len(m.cpair_geom1)
  con = d.contact
  if ncand == 0:
    return d

  dtype = d.qpos.dtype
  # group candidates by type signature
  groups: Dict[Tuple[int, int], List[int]] = {}
  for ci in range(ncand):
    t1 = m.geom_type[m.cpair_geom1[ci]]
    t2 = m.geom_type[m.cpair_geom2[ci]]
    groups.setdefault((t1, t2), []).append(ci)

  # slot start offset per candidate
  from dm_control_tpu.models.compiler import _PAIR_NCON
  slot_of = []
  off = 0
  for ci in range(ncand):
    t1 = m.geom_type[m.cpair_geom1[ci]]
    t2 = m.geom_type[m.cpair_geom2[ci]]
    slot_of.append(off)
    off += _PAIR_NCON[(t1, t2)]

  # Per-env narrowphase outputs: only the STATE-DEPENDENT 7 floats per
  # slot (dist, pos, normal). Everything else (margins, friction,
  # solref/solimp, frame tangents) is either env-independent or only
  # needed for the ncon_sel slots that survive compaction — assembling
  # it per env at ncon_max width was the single largest HBM stream of
  # the whole step (~5 MB/env on humanoid.run at batch 4096).
  dist = jnp.full(m.ncon_max, _BIG, dtype=dtype)
  pos = jnp.zeros((m.ncon_max, 3), dtype=dtype)
  normal = jnp.zeros((m.ncon_max, 3), dtype=dtype)
  normal = normal.at[:, 2].set(1.0)
  # env-independent per-slot parameter tables (vmap keeps unbatched
  # computation unbatched, so these assemble once, not per env)
  imargin = jnp.zeros(m.ncon_max, dtype=dtype)
  igap = jnp.zeros(m.ncon_max, dtype=dtype)
  friction = jnp.ones((m.ncon_max, 5), dtype=dtype)
  solref = jnp.tile(jnp.array([0.02, 1.0], dtype=dtype), (m.ncon_max, 1))
  solimp = jnp.tile(jnp.array([0.9, 0.95, 0.001, 0.5, 2.0], dtype=dtype),
                    (m.ncon_max, 1))
  # slots whose friction tangent must align with a capsule axis
  # (plane-capsule, oracle mjc_PlaneCapsule convention)
  cap_tangent = np.zeros(m.ncon_max, dtype=bool)

  for (t1, t2), cand in groups.items():
    # contact parameter merging per candidate (margin feeds the MPR
    # kernels' support inflation, so merge before the narrowphase)
    mrg, gap, fric, sref, simp = _merge_params(m, cand, dtype)
    if t1 == _G.HFIELD:
      k = _PAIR_NCON[(t1, t2)]
      outs = [_hfield_candidate(m, d, ci, dtype) for ci in cand]
      dd = jnp.stack([o[0] for o in outs])
      pp = jnp.stack([o[1] for o in outs])
      nn = jnp.stack([o[2] for o in outs])
    elif (t1, t2) in _FUNCS:
      fn, k = _FUNCS[(t1, t2)]
      g1 = jnp.array([m.cpair_geom1[ci] for ci in cand],
                     dtype=jnp.int32)
      g2 = jnp.array([m.cpair_geom2[ci] for ci in cand],
                     dtype=jnp.int32)
      gsize = jnp.asarray(m.geom_size)
      dd, pp, nn = jax.vmap(fn)(
          d.geom_xpos[g1], d.geom_xmat[g1], gsize[g1],
          d.geom_xpos[g2], d.geom_xmat[g2], gsize[g2])
    else:
      # convex fallback: MPR (or plane-vs-hull vertex test)
      from dm_control_tpu.ops import mpr as mpr_lib
      if t1 == _G.PLANE:
        k = _PAIR_NCON[(t1, t2)]
        fn = mpr_lib.plane_convex_kernel(t2, k=k)
      else:
        fn = mpr_lib.make_kernel(t1, t2)
        k = 1
      g1l = [m.cpair_geom1[ci] for ci in cand]
      g2l = [m.cpair_geom2[ci] for ci in cand]
      g1 = jnp.array(g1l, dtype=jnp.int32)
      g2 = jnp.array(g2l, dtype=jnp.int32)
      gsize = jnp.asarray(m.geom_size)
      V1 = _hull_verts(m, g1l, dtype)
      V2 = _hull_verts(m, g2l, dtype)
      dd, pp, nn = jax.vmap(fn)(
          d.geom_xpos[g1], d.geom_xmat[g1], gsize[g1], V1,
          d.geom_xpos[g2], d.geom_xmat[g2], gsize[g2], V2, mrg)
    slots = jnp.array(
        [slot_of[ci] + j for ci in cand for j in range(k)],
        dtype=jnp.int32)
    dist = dist.at[slots].set(dd.reshape(-1))
    pos = pos.at[slots].set(pp.reshape(-1, 3))
    normal = normal.at[slots].set(nn.reshape(-1, 3))
    if (t1, t2) == (_G.PLANE, _G.CAPSULE):
      for ci in cand:
        cap_tangent[slot_of[ci]:slot_of[ci] + k] = True
    rep = lambda x: jnp.repeat(x, k, axis=0)
    # oracle semantics (mujoco 3.10, verified empirically): the
    # constraint includes and acts on contacts through the WHOLE margin
    # band — `gap` does not subtract from includemargin
    imargin = imargin.at[slots].set(rep(mrg))
    igap = igap.at[slots].set(rep(gap))
    friction = friction.at[slots].set(rep(fric))
    solref = solref.at[slots].set(rep(sref))
    solimp = solimp.at[slots].set(rep(simp))

  slot_g1 = jnp.asarray(m.pair_geom1, dtype=jnp.int32)
  slot_g2 = jnp.asarray(m.pair_geom2, dtype=jnp.int32)
  active = dist < imargin
  overflow = jnp.zeros((), dtype=bool)

  if m.ncon_sel < m.ncon_max:
    # Top-K per condim group by penetration depth beyond margin.
    # The per-env slot data (7 floats) is packed into ONE matrix and
    # gathered through a one-hot matmul (XLA:TPU lowers batched dynamic
    # gathers at ~20 GB/s; this rides the MXU); the env-independent
    # parameter table is gathered through the same one-hot.
    packed = jnp.concatenate([
        dist[:, None], pos, normal, active.astype(dtype)[:, None],
    ], axis=1)                                     # (ncon_max, 8)
    params = jnp.concatenate([
        imargin[:, None], friction, solref, solimp,
        slot_g1[:, None].astype(dtype), slot_g2[:, None].astype(dtype),
        jnp.asarray(cap_tangent, dtype=dtype)[:, None],
        igap[:, None],
    ], axis=1)                                     # (ncon_max, 17)
    # Per-group selection through LOCAL one-hots: top_k indices stay
    # group-relative (no integer gather of a slot table — XLA lowers
    # traced-index gathers to a serial loop fusion), and the slot data
    # is pre-sliced per group with static indices before the (k_c,
    # n_group) one-hot matmul rides the MXU.
    sp_parts, pr_parts = [], []
    for cdim in sorted(set(m.pair_condim)):
      grp = np.array([s for s in range(m.ncon_max)
                      if m.pair_condim[s] == cdim], dtype=np.int32)
      k_c = sum(1 for s in m.sel_condim if s == cdim)
      packed_g = packed[grp]                       # static gather
      params_g = params[grp]
      if k_c < len(grp):
        key = imargin[grp] - dist[grp]
        _, top = jax.lax.top_k(key, k_c)
        ohg = (top[:, None] ==
               jnp.arange(len(grp), dtype=jnp.int32)).astype(dtype)
        overflow = overflow | (jnp.sum(active[grp]) > k_c)
        sp_parts.append(ohg @ packed_g)            # (k_c, 8)
        pr_parts.append(ohg @ params_g)
      else:
        sp_parts.append(packed_g)
        pr_parts.append(params_g)
    sp = (sp_parts[0] if len(sp_parts) == 1
          else jnp.concatenate(sp_parts))          # (ncon_sel, 8)
    pr = (pr_parts[0] if len(pr_parts) == 1
          else jnp.concatenate(pr_parts))          # (ncon_sel, 16)
    dist = sp[:, 0]
    pos = sp[:, 1:4]
    normal = sp[:, 4:7]
    active = sp[:, 7] > 0.5
    imargin = pr[:, 0]
    friction = pr[:, 1:6]
    solref = pr[:, 6:8]
    solimp = pr[:, 8:13]
    slot_g1 = pr[:, 13].astype(jnp.int32)
    slot_g2 = pr[:, 14].astype(jnp.int32)
    cap_flag = pr[:, 15] > 0.5
    igap = pr[:, 16]
  else:
    cap_flag = jnp.asarray(cap_tangent)

  # Contact frames, built only for the surviving slots. Plane-capsule
  # slots align the first tangent with the capsule axis projected into
  # the plane (oracle mjc_PlaneCapsule), falling back to the canonical
  # frame when plane-perpendicular.
  frame = mops.make_frame(normal)
  if np.any(cap_tangent):
    # capsule z-axes via one-hot matmul (batched dynamic gathers are
    # slow on TPU; ngeom is tiny)
    g2_onehot = (slot_g2[:, None] ==
                 jnp.arange(d.geom_xmat.shape[0])).astype(dtype)
    caxis = g2_onehot @ d.geom_xmat[:, :, 2]
    t_ip = caxis - normal * jnp.sum(caxis * normal, axis=-1,
                                    keepdims=True)
    t_nrm = jnp.linalg.norm(t_ip, axis=-1, keepdims=True)
    t1v = jnp.where(cap_flag[:, None] & (t_nrm > 1e-10),
                    t_ip / jnp.maximum(t_nrm, 1e-12), frame[:, 1])
    t2v = jnp.cross(normal, t1v)
    frame = jnp.stack([normal, t1v, t2v], axis=-2)

  con = con.replace(dist=dist, pos=pos, frame=frame,
                    includemargin=imargin, gap=igap, friction=friction,
                    solref=solref, solimp=solimp, active=active,
                    geom1=slot_g1, geom2=slot_g2, overflow=overflow)
  return d.replace(contact=con)


def _hull_verts(m: Model, geom_ids: List[int], dtype):
  """Padded hull vertex arrays (ncand, Vmax, 3) for a candidate group.

  Non-mesh geoms get a zero row (their support functions ignore verts);
  mesh geoms are padded by repeating their first vertex, which leaves
  argmax-based support functions unaffected.
  """
  nums = []
  for g in geom_ids:
    did = m.geom_dataid[g]
    nums.append(m.mesh_vertnum[did]
                if (m.geom_type[g] == _G.MESH and did >= 0) else 1)
  vmax = max(nums)
  outs = []
  for g, num in zip(geom_ids, nums):
    did = m.geom_dataid[g]
    if m.geom_type[g] == _G.MESH and did >= 0:
      adr = m.mesh_vertadr[did]
      idx = np.minimum(np.arange(vmax), num - 1) + adr
      outs.append(jnp.asarray(m.mesh_vert)[idx].astype(dtype))
    else:
      outs.append(jnp.zeros((vmax, 3), dtype=dtype))
  return jnp.stack(outs)


def _merge_params(m: Model, cand: List[int], dtype):
  """Merged contact params for a list of candidate pairs.

  Fully vectorized over the candidate list (one gather per model array):
  the per-candidate Python loop this replaces dominated trace time on
  models with thousands of candidate pairs (dog: ~3k).
  """
  g1 = np.asarray([m.cpair_geom1[ci] for ci in cand], dtype=np.int32)
  g2 = np.asarray([m.cpair_geom2[ci] for ci in cand], dtype=np.int32)
  exp = np.asarray([m.cpair_explicit[ci] for ci in cand],
                   dtype=np.int32)
  prio = np.asarray(m.geom_priority)
  p1, p2 = prio[g1], prio[g2]

  gm = jnp.asarray(m.geom_margin).astype(dtype)
  gg = jnp.asarray(m.geom_gap).astype(dtype)
  gf = jnp.asarray(m.geom_friction).astype(dtype)
  gr = jnp.asarray(m.geom_solref).astype(dtype)
  gi = jnp.asarray(m.geom_solimp).astype(dtype)
  gs = jnp.asarray(m.geom_solmix).astype(dtype)

  mrg = jnp.maximum(gm[g1], gm[g2])
  gap = jnp.maximum(gg[g1], gg[g2])

  # priority winner (static mask): winner's friction/solref/solimp
  src = np.where(p1 > p2, g1, g2)
  pr = jnp.asarray((p1 != p2)[:, None])
  f3w, rw, iw_ = gf[src], gr[src], gi[src]

  # equal priority: max friction, solmix-weighted solref/solimp
  f3m = jnp.maximum(gf[g1], gf[g2])
  s1, s2 = gs[g1], gs[g2]
  tot = jnp.maximum(s1 + s2, 1e-12)
  w1 = jnp.where((s1 < 1e-12) & (s2 < 1e-12), 0.5,
                 jnp.where(s1 < 1e-12, 0.0,
                           jnp.where(s2 < 1e-12, 1.0, s1 / tot)))
  r1, r2 = gr[g1], gr[g2]
  mix = w1[:, None] * r1 + (1 - w1)[:, None] * r2
  direct = ((r1[:, 0] <= 0) | (r2[:, 0] <= 0))[:, None]
  rm = jnp.where(direct, jnp.minimum(r1, r2), mix)
  im = w1[:, None] * gi[g1] + (1 - w1)[:, None] * gi[g2]

  f3 = jnp.where(pr, f3w, f3m)
  sref = jnp.where(pr, rw, rm)
  simp = jnp.where(pr, iw_, im)
  fric = jnp.stack([f3[:, 0], f3[:, 0], f3[:, 1], f3[:, 2], f3[:, 2]],
                   axis=1)

  # explicit <pair> rows override everything (static mask)
  if np.any(exp >= 0):
    e = np.maximum(exp, 0)
    emask = jnp.asarray(exp >= 0)
    xm = jnp.asarray(m.xpair_margin).astype(dtype)[e]
    xg = jnp.asarray(m.xpair_gap).astype(dtype)[e]
    xf = jnp.asarray(m.xpair_friction).astype(dtype)[e]
    xr = jnp.asarray(m.xpair_solref).astype(dtype)[e]
    xi = jnp.asarray(m.xpair_solimp).astype(dtype)[e]
    mrg = jnp.where(emask, xm, mrg)
    gap = jnp.where(emask, xg, gap)
    fric = jnp.where(emask[:, None], xf, fric)
    sref = jnp.where(emask[:, None], xr, sref)
    simp = jnp.where(emask[:, None], xi, simp)

  return mrg, gap, fric, sref, simp
