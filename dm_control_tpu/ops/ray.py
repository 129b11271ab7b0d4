"""Ray-geom intersection (rangefinder sensors; later: picking, lidar).

Counterpart of the ray functionality the reference exposes through
mjv_select / rangefinder sensors. Pure jnp; each ray is tested against
all geoms with static type dispatch, masked by body exclusion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dm_control_tpu.models import constants
from dm_control_tpu.models.types import Data, Model

_G = constants.GeomType
_NO_HIT = jnp.inf


def _ray_plane(o, v):
  """Ray vs the z=0 plane (local frame); infinite extent."""
  t = -o[2] / jnp.where(jnp.abs(v[2]) < 1e-12, 1e-12, v[2])
  return jnp.where(t > 1e-9, t, _NO_HIT)


def _ray_sphere(o, v, r):
  # general (possibly non-unit) direction
  a = jnp.maximum(jnp.dot(v, v), 1e-12)
  b = jnp.dot(o, v) / a
  cc = (jnp.dot(o, o) - r * r) / a
  disc = b * b - cc
  sq = jnp.sqrt(jnp.maximum(disc, 0.0))
  t0, t1 = -b - sq, -b + sq
  t = jnp.where(t0 > 1e-9, t0, jnp.where(t1 > 1e-9, t1, _NO_HIT))
  return jnp.where(disc >= 0, t, _NO_HIT)


def _ray_capsule(o, v, r, h):
  # infinite cylinder about z
  a = v[0] * v[0] + v[1] * v[1]
  b = o[0] * v[0] + o[1] * v[1]
  cc = o[0] * o[0] + o[1] * o[1] - r * r
  disc = b * b - a * cc
  sq = jnp.sqrt(jnp.maximum(disc, 0.0))
  safe_a = jnp.maximum(a, 1e-12)
  tc0, tc1 = (-b - sq) / safe_a, (-b + sq) / safe_a
  def cyl_ok(t):
    z = o[2] + t * v[2]
    return (t > 1e-9) & (jnp.abs(z) <= h) & (disc >= 0) & (a > 1e-12)
  t_cyl = jnp.where(cyl_ok(tc0), tc0,
                    jnp.where(cyl_ok(tc1), tc1, _NO_HIT))
  # end spheres
  t_top = _ray_sphere(o - jnp.array([0.0, 0, 1]) * h, v, r)
  t_bot = _ray_sphere(o + jnp.array([0.0, 0, 1]) * h, v, r)
  return jnp.minimum(t_cyl, jnp.minimum(t_top, t_bot))


def _ray_box(o, v, half):
  safe_v = jnp.where(jnp.abs(v) < 1e-12, 1e-12, v)
  t1 = (-half - o) / safe_v
  t2 = (half - o) / safe_v
  tmin = jnp.max(jnp.minimum(t1, t2))
  tmax = jnp.min(jnp.maximum(t1, t2))
  hit = (tmax >= jnp.maximum(tmin, 0.0))
  t = jnp.where(tmin > 1e-9, tmin, tmax)
  return jnp.where(hit & (t > 1e-9), t, _NO_HIT)


def _ray_ellipsoid(o, v, size):
  # the t parameter is invariant under the axis scaling
  s = jnp.maximum(size, 1e-12)
  return _ray_sphere(o / s, v / s, 1.0)


def _ray_cylinder(o, v, r, h):
  a = v[0] * v[0] + v[1] * v[1]
  b = o[0] * v[0] + o[1] * v[1]
  cc = o[0] * o[0] + o[1] * o[1] - r * r
  disc = b * b - a * cc
  sq = jnp.sqrt(jnp.maximum(disc, 0.0))
  safe_a = jnp.maximum(a, 1e-12)
  tc0, tc1 = (-b - sq) / safe_a, (-b + sq) / safe_a
  def cyl_ok(t):
    z = o[2] + t * v[2]
    return (t > 1e-9) & (jnp.abs(z) <= h) & (disc >= 0) & (a > 1e-12)
  t_cyl = jnp.where(cyl_ok(tc0), tc0,
                    jnp.where(cyl_ok(tc1), tc1, _NO_HIT))
  # caps
  safe_vz = jnp.where(jnp.abs(v[2]) < 1e-12, 1e-12, v[2])
  def cap(zc):
    t = (zc - o[2]) / safe_vz
    x, y = o[0] + t * v[0], o[1] + t * v[1]
    ok = (t > 1e-9) & (x * x + y * y <= r * r)
    return jnp.where(ok, t, _NO_HIT)
  return jnp.minimum(t_cyl, jnp.minimum(cap(h), cap(-h)))


def ray_geom_dist(m: Model, d: Data, origin, direction,
                  exclude_body: int = -1):
  """Distance along the ray to the nearest geom surface, or inf."""
  best = jnp.asarray(_NO_HIT, dtype=origin.dtype)
  for g in range(m.ngeom):
    if m.geom_bodyid[g] == exclude_body:
      continue
    gt = m.geom_type[g]
    o = d.geom_xmat[g].T @ (origin - d.geom_xpos[g])
    v = d.geom_xmat[g].T @ direction
    size = jnp.asarray(m.geom_size)[g]
    if gt == _G.PLANE:
      t = _ray_plane(o, v)
    elif gt == _G.SPHERE:
      t = _ray_sphere(o, v, size[0])
    elif gt == _G.CAPSULE:
      t = _ray_capsule(o, v, size[0], size[1])
    elif gt == _G.BOX:
      t = _ray_box(o, v, size[:3])
    elif gt == _G.ELLIPSOID:
      t = _ray_ellipsoid(o, v, size[:3])
    elif gt == _G.CYLINDER:
      t = _ray_cylinder(o, v, size[0], size[1])
    else:
      continue
    best = jnp.minimum(best, t)
  return best


def rangefinder(m: Model, d: Data, siteid: int):
  """Rangefinder reading: distance along site +z, or -1 when no hit."""
  origin = d.site_xpos[siteid]
  direction = d.site_xmat[siteid][:, 2]
  dist = ray_geom_dist(m, d, origin, direction,
                       exclude_body=m.site_bodyid[siteid])
  return jnp.where(jnp.isinf(dist), -1.0, dist)
