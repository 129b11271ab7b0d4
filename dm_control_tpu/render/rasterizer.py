"""Analytic ray-casting renderer over geom primitives.

Output contracts follow the reference Camera.render
(reference dm_control/mujoco/engine.py:840-946):
  * RGB: (height, width, 3) uint8
  * depth: (height, width) float32, metric distance along the camera's
    viewing axis (the reference linearizes the GL depth buffer to the
    same quantity, engine.py:916-924)
  * segmentation: (height, width, 2) int32 of (object id, object type),
    -1 where there is no geom (engine.py:925-941)

Design notes (TPU-first): one fused kernel evaluates every pixel ray
against every geom analytically — no triangles, no scatter, static
shapes throughout — so XLA tiles it like any other elementwise/reduce
graph, and a batched `vmap(render)` renders a whole env batch in one
launch. Camera poses are computed from Model/Data on the fly (the
engine does not carry camera FK in Data).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from dm_control_tpu.models import constants
from dm_control_tpu.models.types import Data, Model
from dm_control_tpu.ops import math as mops

_G = constants.GeomType
_BIG = 1e9

# mjtObj object-type code for geoms, matching the oracle's segmentation
# channel convention (mjOBJ_GEOM = 5)
_OBJ_GEOM = 5


# ---------------------------------------------------------------------------
# camera pose
# ---------------------------------------------------------------------------


def camera_pose(m: Model, d: Data, camera_id: int):
  """World (pos, mat) of one camera; mat columns = camera axes
  (x right, y up, camera looks along -z, MuJoCo convention)."""
  if camera_id < 0:
    return _free_camera_pose(m, d)
  b = m.cam_bodyid[camera_id]
  mode = m.cam_mode[camera_id]
  cpos = jnp.asarray(m.cam_pos)[camera_id]
  cmat = mops.quat_to_mat(jnp.asarray(m.cam_quat)[camera_id])
  # compiler mode codes: fixed=0, track=1, trackcom=2, targetbody=3
  if mode == 1:        # track: world-aligned offset, fixed orientation
    return d.xpos[b] + cpos, cmat
  if mode == 2:        # trackcom: follows the subtree center of mass
    return d.subtree_com[b] + cpos, cmat
  if mode == 3:        # targetbody: aims at the target body's origin
    pos = d.xpos[b] + d.xmat[b] @ cpos
    target = d.xpos[m.cam_targetbodyid[camera_id]]
    return pos, _lookat(pos, target)
  # fixed: rigidly attached to the owning body
  return d.xpos[b] + d.xmat[b] @ cpos, d.xmat[b] @ cmat


def _lookat(pos, target):
  """Camera matrix with -z pointing from pos to target."""
  fwd = target - pos
  fwd = fwd / jnp.maximum(jnp.linalg.norm(fwd), 1e-12)
  up0 = jnp.array([0.0, 0.0, 1.0], dtype=fwd.dtype)
  right = jnp.cross(fwd, up0)
  rn = jnp.linalg.norm(right)
  right = jnp.where(rn > 1e-6, right / jnp.maximum(rn, 1e-12),
                    jnp.array([1.0, 0.0, 0.0], dtype=fwd.dtype))
  up = jnp.cross(right, fwd)
  return jnp.stack([right, up, -fwd], axis=1)


def _free_camera_pose(m: Model, d: Data):
  """Default free camera: look at the model's center from a distance
  scaled by its extent (the mjv default view analogue)."""
  center = jnp.mean(d.geom_xpos, axis=0) if m.ngeom else jnp.zeros(3)
  sizes = np.asarray(m.geom_size)
  extent = float(np.max(sizes)) * 4.0 + 1.0
  offset = jnp.array([0.0, -1.2 * extent, 0.8 * extent],
                     dtype=d.qpos.dtype)
  pos = center + offset
  return pos, _lookat(pos, center)


# ---------------------------------------------------------------------------
# analytic ray-primitive intersections (geom-local frame)
# each returns (t, normal_local); t = _BIG on miss
# ---------------------------------------------------------------------------


def _ray_plane(o, v, size):
  t = jnp.where(jnp.abs(v[2]) > 1e-12, -o[2] / v[2], _BIG)
  p = o + t * v
  half_x = jnp.where(size[0] > 0, size[0], _BIG)
  half_y = jnp.where(size[1] > 0, size[1], _BIG)
  ok = (t > 1e-6) & (jnp.abs(p[0]) <= half_x) & (jnp.abs(p[1]) <= half_y)
  n = jnp.array([0.0, 0.0, 1.0], dtype=o.dtype)
  return jnp.where(ok, t, _BIG), n


def _ray_sphere_at(o, v, center, r):
  oc = o - center
  b = jnp.dot(oc, v)
  c = jnp.dot(oc, oc) - r * r
  disc = b * b - c
  sq = jnp.sqrt(jnp.maximum(disc, 0.0))
  t = -b - sq
  t = jnp.where((disc >= 0) & (t > 1e-6), t, _BIG)
  n = (o + t * v) - center
  return t, n


def _ray_sphere(o, v, size):
  return _ray_sphere_at(o, v, jnp.zeros(3, o.dtype), size[0])


def _ray_ellipsoid(o, v, size):
  s = jnp.maximum(size[:3], 1e-9)
  os_, vs = o / s, v / s
  a = jnp.dot(vs, vs)
  b = jnp.dot(os_, vs)
  c = jnp.dot(os_, os_) - 1.0
  disc = b * b - a * c
  sq = jnp.sqrt(jnp.maximum(disc, 0.0))
  t = (-b - sq) / jnp.maximum(a, 1e-12)
  t = jnp.where((disc >= 0) & (t > 1e-6), t, _BIG)
  n = (o + t * v) / (s * s)
  return t, n


def _ray_infinite_cyl(o, v, r):
  a = v[0] * v[0] + v[1] * v[1]
  b = o[0] * v[0] + o[1] * v[1]
  c = o[0] * o[0] + o[1] * o[1] - r * r
  disc = b * b - a * c
  sq = jnp.sqrt(jnp.maximum(disc, 0.0))
  t = (-b - sq) / jnp.maximum(a, 1e-12)
  return jnp.where((disc >= 0) & (a > 1e-12) & (t > 1e-6), t, _BIG)


def _ray_capsule(o, v, size):
  r, half = size[0], size[1]
  t_cyl = _ray_infinite_cyl(o, v, r)
  z = o[2] + t_cyl * v[2]
  t_cyl = jnp.where(jnp.abs(z) <= half, t_cyl, _BIG)
  top = jnp.array([0.0, 0.0, 1.0], dtype=o.dtype) * half
  t_a, _ = _ray_sphere_at(o, v, top, r)
  t_b, _ = _ray_sphere_at(o, v, -top, r)
  t = jnp.minimum(t_cyl, jnp.minimum(t_a, t_b))
  p = o + t * v
  axis_z = jnp.clip(p[2], -half, half)
  n = p - jnp.array([0.0, 0.0, 1.0], dtype=o.dtype) * axis_z
  return t, n


def _ray_cylinder(o, v, size):
  r, half = size[0], size[1]
  t_side = _ray_infinite_cyl(o, v, r)
  z = o[2] + t_side * v[2]
  t_side = jnp.where(jnp.abs(z) <= half, t_side, _BIG)
  # caps
  sgn = jnp.where(v[2] > 0, -1.0, 1.0)
  t_cap = jnp.where(jnp.abs(v[2]) > 1e-12,
                    (sgn * half - o[2]) / v[2], _BIG)
  pc = o + t_cap * v
  t_cap = jnp.where((t_cap > 1e-6) &
                    (pc[0] ** 2 + pc[1] ** 2 <= r * r), t_cap, _BIG)
  t = jnp.minimum(t_side, t_cap)
  p = o + t * v
  side = t_side <= t_cap
  n = jnp.where(side,
                jnp.array([1.0, 1.0, 0.0], dtype=o.dtype) * p,
                jnp.array([0.0, 0.0, 1.0], dtype=o.dtype) * sgn)
  return t, n


def _ray_box(o, v, size):
  s = size[:3]
  inv = 1.0 / jnp.where(jnp.abs(v) > 1e-12, v, 1e-12)
  t1 = (-s - o) * inv
  t2 = (s - o) * inv
  tmin = jnp.max(jnp.minimum(t1, t2))
  tmax = jnp.min(jnp.maximum(t1, t2))
  hit = (tmax >= tmin) & (tmax > 1e-6)
  t = jnp.where(tmin > 1e-6, tmin, _BIG)
  t = jnp.where(hit, t, _BIG)
  p = o + t * v
  q = p / jnp.maximum(s, 1e-12)
  axis = jnp.argmax(jnp.abs(q))
  n = jnp.zeros(3, o.dtype).at[axis].set(jnp.sign(q[axis]))
  return t, n


_RAY_FUNCS = {
    int(_G.PLANE): _ray_plane,
    int(_G.SPHERE): _ray_sphere,
    int(_G.CAPSULE): _ray_capsule,
    int(_G.ELLIPSOID): _ray_ellipsoid,
    int(_G.CYLINDER): _ray_cylinder,
    int(_G.BOX): _ray_box,
}


def _ray_hull(o, v, planes):
  """Ray vs convex polytope given facet half-spaces n.x + d <= 0.

  Slab method over the facets: entering planes raise t_enter, exiting
  planes lower t_exit. Zero-padded facets are neutral (parallel, not
  outside). Mesh geoms render as their convex hulls — the same
  representation the MPR narrowphase collides (ops/mpr.py), so what
  you see is what the physics touches.
  """
  n = planes[:, :3]
  dd = planes[:, 3]
  denom = n @ v
  num = n @ o + dd
  t = -num / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
  entering = denom < -1e-12
  exiting = denom > 1e-12
  parallel_out = (jnp.abs(denom) <= 1e-12) & (num > 1e-9)
  t_enter = jnp.max(jnp.where(entering, t, -_BIG))
  t_exit = jnp.min(jnp.where(exiting, t, _BIG))
  hit = (t_enter <= t_exit) & (t_enter > 1e-6) & ~jnp.any(parallel_out)
  tt = jnp.where(hit, t_enter, _BIG)
  nn = n[jnp.argmax(jnp.where(entering, t, -_BIG))]
  return tt, nn


def _hull_planes_for_geom(m: Model, g: int):
  """(F, 4) hull facet half-spaces of a mesh geom, host-side."""
  from scipy.spatial import ConvexHull
  did = int(m.geom_dataid[g])
  adr, num = int(m.mesh_vertadr[did]), int(m.mesh_vertnum[did])
  verts = np.asarray(m.mesh_vert)[adr:adr + num]
  return ConvexHull(verts).equations


def _ray_hfield(o, v, grid, nrow, ncol, size, n_march=48, n_refine=8):
  """Ray vs heightfield surface: AABB clip, fixed march to bracket the
  first below-surface sample, bisection refine, bilinear normal."""
  from dm_control_tpu.ops.collision import _hfield_surface
  rx, ry, ztop, zbot = size[0], size[1], size[2], size[3]
  dtype = o.dtype

  # clip to the hfield AABB (z in [-zbot, ztop])
  lo = jnp.stack([-rx, -ry, -zbot])
  hi = jnp.stack([rx, ry, ztop])
  inv = 1.0 / jnp.where(jnp.abs(v) > 1e-12, v, 1e-12)
  t1 = (lo - o) * inv
  t2 = (hi - o) * inv
  t_in = jnp.maximum(jnp.max(jnp.minimum(t1, t2)), 1e-6)
  t_out = jnp.min(jnp.maximum(t1, t2))
  valid = t_out > t_in

  def below(t):
    p = o + t * v
    h, _, inside = _hfield_surface(grid, nrow, ncol, rx, ry, ztop, p)
    return (p[2] < h) & inside

  ts = jnp.linspace(t_in, t_out, n_march, dtype=dtype)
  under = jax.vmap(below)(ts)
  first = jnp.argmax(under)
  any_hit = jnp.any(under) & valid
  t_hi = ts[first]
  t_lo = ts[jnp.maximum(first - 1, 0)]

  def refine(carry, _):
    t_lo, t_hi = carry
    mid = 0.5 * (t_lo + t_hi)
    b = below(mid)
    return (jnp.where(b, t_lo, mid), jnp.where(b, mid, t_hi)), None

  (t_lo, t_hi), _ = jax.lax.scan(refine, (t_lo, t_hi), None,
                                 length=n_refine)
  t = 0.5 * (t_lo + t_hi)
  p = o + t * v
  _, nrm, _ = _hfield_surface(grid, nrow, ncol, rx, ry, ztop, p)
  return jnp.where(any_hit, t, _BIG), nrm


# ---------------------------------------------------------------------------
# renderer
# ---------------------------------------------------------------------------


def render(m: Model, d: Data, height: int = 240, width: int = 320,
           camera_id: int = -1, depth: bool = False,
           segmentation: bool = False, cam_pos=None, cam_mat=None,
           fovy=None):
  """Render one frame. See module docstring for output contracts.

  `cam_pos`/`cam_mat`/`fovy` override the model camera — used by
  MovableCamera (free-camera pose set from lookat/distance/azimuth/
  elevation, reference engine.py:1003-1058).
  """
  dtype = d.qpos.dtype
  if cam_pos is None or cam_mat is None:
    cam_pos, cam_mat = camera_pose(m, d, camera_id)
  if fovy is None:
    fovy = (float(np.asarray(m.cam_fovy)[camera_id])
            if camera_id >= 0 else 45.0)

  # pixel rays (camera looks along -z; y up; x right)
  tan_half = np.tan(np.deg2rad(fovy) / 2.0)
  aspect = width / height
  ys = jnp.linspace(tan_half, -tan_half, height, dtype=dtype)
  xs = jnp.linspace(-tan_half * aspect, tan_half * aspect, width,
                    dtype=dtype)
  px, py = jnp.meshgrid(xs, ys)
  dirs = jnp.stack([px, py, -jnp.ones_like(px)], axis=-1)
  dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
  dirs = dirs @ cam_mat.T                      # (h, w, 3) world

  best_t = jnp.full((height, width), _BIG, dtype=dtype)
  best_n = jnp.zeros((height, width, 3), dtype=dtype)
  best_g = jnp.full((height, width), -1, dtype=jnp.int32)

  # group geoms by type; evaluate each group as one vmapped kernel
  groups = {}
  mesh_gids, hfield_gids = [], []
  for g in range(m.ngeom):
    if np.asarray(m.geom_rgba)[g, 3] <= 0:
      continue
    t = int(m.geom_type[g])
    if t in _RAY_FUNCS:
      groups.setdefault(t, []).append(g)
    elif t == int(_G.MESH):
      mesh_gids.append(g)
    elif t == int(_G.HFIELD):
      hfield_gids.append(g)
    else:
      raise NotImplementedError(
          f'rasterizer cannot draw visible geom {g} of type {t}; '
          'hide it (rgba alpha 0) or add a ray kernel')

  def merge(best, gid, ts, ns):
    best_t, best_n, best_g = best
    gbest = jnp.argmin(ts, axis=0)                  # (h, w)
    tbest = jnp.min(ts, axis=0)
    nbest = jnp.take_along_axis(
        ns, gbest[None, :, :, None], axis=0)[0]
    better = tbest < best_t
    return (jnp.where(better, tbest, best_t),
            jnp.where(better[..., None], nbest, best_n),
            jnp.where(better, gid[gbest], best_g))

  best = (best_t, best_n, best_g)
  gsize = jnp.asarray(m.geom_size, dtype)
  for t, gids in groups.items():
    fn = _RAY_FUNCS[t]
    gid = jnp.asarray(np.array(gids, dtype=np.int32))
    gpos = d.geom_xpos[gid]                     # (G, 3)
    gmat = d.geom_xmat[gid]                     # (G, 3, 3)
    gsz = gsize[gid]

    def per_geom(gp, gm, gs):
      # transform all rays into the geom frame
      o = (cam_pos - gp) @ gm                   # (3,)
      vloc = dirs @ gm                          # (h, w, 3)
      tt, nn = jax.vmap(jax.vmap(lambda v: fn(o, v, gs)))(vloc)
      return tt, nn @ gm.T                      # world normals

    ts, ns = jax.vmap(per_geom)(gpos, gmat, gsz)   # (G, h, w[,3])
    best = merge(best, gid, ts, ns)

  if mesh_gids:
    # mesh geoms as convex hulls, zero-padded to a shared facet count
    plane_list = [_hull_planes_for_geom(m, g) for g in mesh_gids]
    fmax = max(p.shape[0] for p in plane_list)
    planes = jnp.asarray(np.stack([
        np.pad(p, ((0, fmax - p.shape[0]), (0, 0))) for p in plane_list
    ]), dtype)                                   # (G, F, 4)
    gid = jnp.asarray(np.array(mesh_gids, dtype=np.int32))

    def per_mesh(gp, gm, pl):
      o = (cam_pos - gp) @ gm
      vloc = dirs @ gm
      tt, nn = jax.vmap(jax.vmap(lambda v: _ray_hull(o, v, pl)))(vloc)
      return tt, nn @ gm.T

    ts, ns = jax.vmap(per_mesh)(d.geom_xpos[gid], d.geom_xmat[gid],
                                planes)
    best = merge(best, gid, ts, ns)

  for g in hfield_gids:
    hid = int(m.geom_dataid[g])
    nrow, ncol = int(m.hfield_nrow[hid]), int(m.hfield_ncol[hid])
    adr = int(m.hfield_adr[hid])
    grid = jnp.asarray(m.hfield_data, dtype)[
        adr:adr + nrow * ncol].reshape(nrow, ncol)
    hsize = jnp.asarray(m.hfield_size, dtype)[hid]
    gp, gm = d.geom_xpos[g], d.geom_xmat[g]
    o = (cam_pos - gp) @ gm
    vloc = dirs @ gm
    tt, nn = jax.vmap(jax.vmap(
        lambda v: _ray_hfield(o, v, grid, nrow, ncol, hsize)))(vloc)
    best = merge(best, jnp.asarray([g], dtype=jnp.int32),
                 tt[None], (nn @ gm.T)[None])

  best_t, best_n, best_g = best
  hit = best_t < _BIG

  if segmentation:
    seg_id = jnp.where(hit, best_g, -1)
    seg_type = jnp.where(hit, _OBJ_GEOM, -1)
    return jnp.stack([seg_id, seg_type], axis=-1).astype(jnp.int32)

  if depth:
    fwd = -cam_mat[:, 2]
    zdist = best_t * (dirs @ fwd)
    return jnp.where(hit, zdist, 0.0).astype(jnp.float32)

  # ---- appearance resolution (static per geom; material pipeline) ----
  # A geom whose rgba is still the MJCF default AND that references a
  # material takes the material's appearance — the reference renderer's
  # resolution rule (geom rgba overrides material only when specified).
  ngeom = m.ngeom
  rgba_np = np.asarray(m.geom_rgba, np.float64)
  matid = list(m.geom_matid) if len(m.geom_matid) == ngeom else (
      [-1] * ngeom)
  albedo_np = rgba_np[:, :3].copy() if ngeom else np.zeros((1, 3))
  spec_np = np.full(max(ngeom, 1), 0.5)
  shin_np = np.full(max(ngeom, 1), 0.5)
  emis_np = np.zeros(max(ngeom, 1))
  textured = []    # (geom id, texid, repeat, texuniform)
  for g in range(ngeom):
    mi = matid[g]
    if mi < 0 or not np.allclose(rgba_np[g], (0.5, 0.5, 0.5, 1.0)):
      continue
    albedo_np[g] = np.asarray(m.mat_rgba[mi][:3])
    spec_np[g] = m.mat_specular[mi]
    shin_np[g] = m.mat_shininess[mi]
    emis_np[g] = m.mat_emission[mi]
    ti = m.mat_texid[mi]
    if ti >= 0 and m.tex_builtin[ti] in (2, 3):   # checker / gradient
      textured.append((g, ti, np.asarray(m.mat_texrepeat[mi]),
                       int(m.mat_texuniform[mi])))

  # Headlight: DIRECTIONAL along the camera forward axis (calibrated
  # against oracle EGL renders — a flat floor shades CONSTANT under the
  # reference headlight, so lambert uses the view axis, not per-pixel
  # ray directions). ambient/diffuse/specular come from
  # <visual><headlight> (defaults 0.1/0.4/0.5).
  hl = np.asarray(m.vis_headlight, np.float64)
  hl_amb, hl_dif, hl_spec, hl_on = hl[0:3], hl[3:6], hl[6:9], hl[9]
  if not hl_on:
    hl_amb = np.full(3, 0.1)
    hl_dif = np.zeros(3)
    hl_spec = np.zeros(3)
  fwd_axis = -cam_mat[:, 2]
  n = best_n / jnp.maximum(
      jnp.linalg.norm(best_n, axis=-1, keepdims=True), 1e-12)
  lambert = jnp.abs(jnp.sum(n * fwd_axis, axis=-1))
  gidx = jnp.clip(best_g, 0, max(ngeom - 1, 0))
  albedo = jnp.asarray(albedo_np, dtype)[gidx]

  # procedural texture sampling at the hit point (builtin checker /
  # gradient; bitmaps are never stored — the builtins are analytic)
  if textured:
    p_world = cam_pos + best_t[..., None] * dirs
    gsize_np = np.asarray(m.geom_size)
    for g, ti, rep, uni in textured:
      lp = (p_world - d.geom_xpos[g]) @ d.geom_xmat[g]
      if uni:
        # one repetition of the (2x2-cell) builtin bitmap covers
        # 2/texrepeat spatial units (calibrated against oracle renders:
        # texrepeat="1 1" texuniform="true" gives 1-unit checker cells)
        uv = lp[..., :2] * (jnp.asarray(rep, dtype) * 0.5)
      else:
        denom = np.maximum(2.0 * gsize_np[g, :2], 1e-9)
        uv = (lp[..., :2] / jnp.asarray(denom, dtype) + 0.5
              ) * jnp.asarray(rep, dtype)
      rgb1 = jnp.asarray(m.tex_rgb1[ti], dtype)
      rgb2 = jnp.asarray(m.tex_rgb2[ti], dtype)
      if m.tex_builtin[ti] == 2:                      # checker
        fu = uv - jnp.floor(uv)
        odd = jnp.logical_xor(fu[..., 0] < 0.5, fu[..., 1] < 0.5)
        tex_rgb = jnp.where(odd[..., None], rgb2, rgb1)
        if m.tex_mark[ti] == 1:                       # edge mark
          border = 1.0 / max(m.tex_width[ti], 2)
          on_edge = ((fu[..., 0] < border) | (fu[..., 0] > 1 - border) |
                     (fu[..., 1] < border) | (fu[..., 1] > 1 - border))
          tex_rgb = jnp.where(
              on_edge[..., None], jnp.asarray(m.tex_markrgb[ti], dtype),
              tex_rgb)
      else:                                           # gradient
        s = jnp.clip(uv[..., 1] - jnp.floor(uv[..., 1]), 0.0, 1.0)
        tex_rgb = rgb2 + (rgb1 - rgb2) * s[..., None]
      albedo = jnp.where((best_g == g)[..., None], tex_rgb, albedo)

  # background: black (the reference default), or the model's skybox
  # gradient sampled by ray elevation (calibrated: s = (1+z)/2 within
  # a few 1e-2 of the oracle's cube-mapped gradient near the horizon)
  sky = jnp.zeros(3, dtype=dtype)
  for ti in range(len(m.tex_type)):
    if m.tex_type[ti] == 2 and m.tex_builtin[ti] == 3:   # skybox grad
      rgb1 = jnp.asarray(m.tex_rgb1[ti], dtype)
      rgb2 = jnp.asarray(m.tex_rgb2[ti], dtype)
      elev = jnp.clip(0.5 * (1.0 + dirs[..., 2]), 0.0, 1.0)
      sky = rgb2 + (rgb1 - rgb2) * elev[..., None]
      break

  spec_g = jnp.asarray(spec_np, dtype)[gidx]
  shin_g = jnp.asarray(shin_np, dtype)[gidx]
  emis_g = jnp.asarray(emis_np, dtype)[gidx]
  shade = (jnp.asarray(hl_amb, dtype) + emis_g[..., None] +
           jnp.asarray(hl_dif, dtype) * lambert[..., None])
  spec_term = (jnp.asarray(hl_spec, dtype) * spec_g[..., None] *
               (lambert ** (1.0 + 127.0 * jnp.clip(shin_g, 0.0, 1.0))
                )[..., None])
  rgb = albedo * shade + spec_term
  rgb = jnp.where(hit[..., None], rgb, sky)
  return (jnp.clip(rgb, 0.0, 1.0) * 255).astype(jnp.uint8)


def raycast(m: Model, d: Data, origin, direction):
  """Nearest visible geom along a single world-space ray.

  Returns (geom_id, t): geom_id == -1 and t == inf when nothing is hit.
  TPU-native analogue of mjv_select's ray query (reference
  dm_control/mujoco/engine.py:948-1000) — the viewer/picking entry.
  """
  origin = jnp.asarray(origin, dtype=d.qpos.dtype)
  direction = jnp.asarray(direction, dtype=d.qpos.dtype)
  direction = direction / jnp.maximum(jnp.linalg.norm(direction), 1e-12)

  best_t, best_g = _BIG, -1
  gsize = jnp.asarray(m.geom_size, d.qpos.dtype)
  for g in range(m.ngeom):
    t_code = int(m.geom_type[g])
    supported = t_code in _RAY_FUNCS or t_code == int(_G.MESH)
    if not supported or np.asarray(m.geom_rgba)[g, 3] <= 0:
      continue
    gm = d.geom_xmat[g]
    o = (origin - d.geom_xpos[g]) @ gm
    v = direction @ gm
    if t_code == int(_G.MESH):
      planes = jnp.asarray(_hull_planes_for_geom(m, g), d.qpos.dtype)
      t, _ = _ray_hull(o, v, planes)
    else:
      t, _ = _RAY_FUNCS[t_code](o, v, gsize[g])
    t = float(jax.device_get(t))
    if t < best_t:
      best_t, best_g = t, g
  if best_t >= _BIG:
    return -1, float('inf')
  return best_g, best_t
