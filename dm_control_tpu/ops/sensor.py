"""Sensor evaluation (all stages fused at the end of forward()).

Implements the sensor set used across the reference task suites
(reference: dm_control/suite/*.xml sensor blocks): touch, imu triplet
(accelerometer / velocimeter / gyro), force/torque, joint/tendon/actuator
readouts, frame and subtree quantities, magnetometer, clock.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dm_control_tpu.models import constants
from dm_control_tpu.models.types import Data, Model
from dm_control_tpu.ops import math as mops

_S = constants.SensorType
_OBJ = constants.ObjType


def _object_velocity(m: Model, d: Data, point, bodyid):
  root = m.body_rootid[bodyid]
  vel = d.cvel[bodyid]
  r = point - d.subtree_com[root]
  return vel[:3], vel[3:] + jnp.cross(vel[:3], r)


def _rne_post(m: Model, d: Data):
  """Post-constraint body accelerations and interaction forces."""
  dtype = d.qpos.dtype
  gravity = jnp.where(
      m.opt.disableflags & constants.DisableBit.GRAVITY,
      jnp.zeros(3, dtype=dtype), m.opt.gravity.astype(dtype))
  cacc0 = jnp.concatenate([jnp.zeros(3, dtype=dtype), -gravity])
  contrib = d.cdof_dot * d.qvel[:, None] + d.cdof * d.qacc[:, None]
  cacc = cacc0 + m.body_dof_mask @ contrib

  fb = (jnp.einsum('bij,bj->bi', d.cinert, cacc) +
        mops.cross_force(d.cvel, jnp.einsum('bij,bj->bi', d.cinert,
                                            d.cvel)))
  # external forces: contacts + xfrc_applied
  fext = jnp.zeros((m.nbody, 6), dtype=dtype)
  rootid = jnp.array(m.body_rootid, dtype=jnp.int32)
  if m.ncon_sel:
    con = d.contact
    gbody = jnp.asarray(m.geom_bodyid, dtype=jnp.int32)
    b1 = gbody[con.geom1]                             # (ncon,)
    b2 = gbody[con.geom2]
    f_world = jnp.einsum('sji,sj->si', con.frame, con.force)
    f_world = jnp.where(con.active[:, None], f_world, 0.0)
    for b, sign in ((b1, -1.0), (b2, 1.0)):
      o = d.subtree_com[rootid[b]]                    # (ncon, 3)
      trq = jnp.cross(con.pos - o, f_world) * sign
      fext = fext.at[b].add(
          jnp.concatenate([trq, sign * f_world], axis=-1))
  if m.nbody > 1:
    frc = d.xfrc_applied[:, :3]
    trq = d.xfrc_applied[:, 3:]
    off = d.xipos - d.subtree_com[rootid]
    fext = fext + jnp.concatenate(
        [trq + jnp.cross(off, frc), frc], axis=-1)

  cfrc_int = m.subtree_mask @ (fb - fext)
  return cacc, cfrc_int


def _object_acceleration(m: Model, d: Data, cacc, point, bodyid):
  root = m.body_rootid[bodyid]
  o = d.subtree_com[root]
  r = point - o
  ang_acc = cacc[bodyid, :3]
  lin_acc = cacc[bodyid, 3:] + jnp.cross(ang_acc, r)
  ang_vel, lin_vel = _object_velocity(m, d, point, bodyid)
  lin_acc = lin_acc + jnp.cross(ang_vel, lin_vel)
  return ang_acc, lin_acc


def _site_zone(m: Model, d: Data, siteid: int, point):
  """Is a world point inside the site's volume?"""
  stype = m.site_type[siteid]
  local = d.site_xmat[siteid].T @ (point - d.site_xpos[siteid])
  size = m.site_size[siteid]
  if stype == constants.GeomType.SPHERE:
    return jnp.linalg.norm(local) <= size[0]
  if stype == constants.GeomType.CAPSULE:
    z = jnp.clip(local[2], -size[1], size[1])
    return jnp.linalg.norm(local - jnp.array([0.0, 0, 1]) * z) <= size[0]
  if stype == constants.GeomType.ELLIPSOID:
    return jnp.sum((local / jnp.maximum(size, 1e-12)) ** 2) <= 1.0
  # box / cylinder: axis-aligned bounds
  return jnp.all(jnp.abs(local) <= jnp.maximum(size, 1e-12))


# sensors that depend on the acceleration/force stage (evaluated after
# the constraint solve, on the pre-integration state — mj_step2 timing)
_ACC_STAGE = (_S.TOUCH, _S.ACCELEROMETER, _S.FORCE, _S.TORQUE,
              _S.ACTUATORFRC)


def sensors(m: Model, d: Data, stages: str = 'all') -> Data:
  """Evaluate sensors. stages: 'all', 'pv' (position/velocity only),
  or 'acc' (acceleration/force stage only)."""
  if not m.nsensor:
    return d
  dtype = d.qpos.dtype
  out = jnp.asarray(d.sensordata, dtype=dtype)

  selected = [i for i in range(m.nsensor)
              if stages == 'all'
              or (stages == 'acc') == (m.sensor_type[i] in _ACC_STAGE)]
  if not selected:
    return d

  needs_acc = any(
      m.sensor_type[i] in (_S.ACCELEROMETER, _S.FORCE, _S.TORQUE)
      for i in selected)
  cacc = cfrc_int = None
  if needs_acc:
    cacc, cfrc_int = _rne_post(m, d)
  d = d.replace(cacc=cacc if cacc is not None else d.cacc,
                cfrc_int=cfrc_int if cfrc_int is not None else d.cfrc_int)

  for i in selected:
    st = m.sensor_type[i]
    oid = m.sensor_objid[i]
    adr = m.sensor_adr[i]
    dim = m.sensor_dim[i]

    if st == _S.TOUCH:
      body = m.site_bodyid[oid]
      if m.ncon_sel:
        con = d.contact
        gbody = jnp.asarray(m.geom_bodyid, dtype=jnp.int32)
        onbody = (gbody[con.geom1] == body) | (gbody[con.geom2] == body)
        inzone = jax.vmap(
            lambda p: _site_zone(m, d, oid, p))(con.pos)
        fn = jnp.maximum(con.force[:, 0], 0.0)
        total = jnp.sum(
            jnp.where(con.active & onbody & inzone, fn, 0.0))
      else:
        total = jnp.zeros((), dtype=dtype)
      val = total[None]
    elif st == _S.ACCELEROMETER:
      body = m.site_bodyid[oid]
      _, lin = _object_acceleration(m, d, cacc, d.site_xpos[oid], body)
      val = d.site_xmat[oid].T @ lin
    elif st == _S.VELOCIMETER:
      body = m.site_bodyid[oid]
      _, lin = _object_velocity(m, d, d.site_xpos[oid], body)
      val = d.site_xmat[oid].T @ lin
    elif st == _S.GYRO:
      body = m.site_bodyid[oid]
      ang, _ = _object_velocity(m, d, d.site_xpos[oid], body)
      val = d.site_xmat[oid].T @ ang
    elif st in (_S.FORCE, _S.TORQUE):
      body = m.site_bodyid[oid]
      root = m.body_rootid[body]
      o = d.subtree_com[root]
      spatial = cfrc_int[body]
      trq, frc = spatial[:3], spatial[3:]
      if st == _S.FORCE:
        val = d.site_xmat[oid].T @ frc
      else:
        trq_site = trq - jnp.cross(d.site_xpos[oid] - o, frc)
        val = d.site_xmat[oid].T @ trq_site
    elif st == _S.JOINTPOS:
      val = d.qpos[m.jnt_qposadr[oid]][None]
    elif st == _S.JOINTVEL:
      val = d.qvel[m.jnt_dofadr[oid]][None]
    elif st == _S.TENDONPOS:
      val = d.ten_length[oid][None]
    elif st == _S.TENDONVEL:
      val = d.ten_velocity[oid][None]
    elif st == _S.ACTUATORPOS:
      val = d.actuator_length[oid][None]
    elif st == _S.ACTUATORVEL:
      val = d.actuator_velocity[oid][None]
    elif st == _S.ACTUATORFRC:
      val = d.actuator_force[oid][None]
    elif st == _S.BALLQUAT:
      qadr = m.jnt_qposadr[oid]
      val = mops.normalize_quat(d.qpos[qadr:qadr + 4])
    elif st == _S.BALLANGVEL:
      vadr = m.jnt_dofadr[oid]
      val = d.qvel[vadr:vadr + 3]
    elif st == _S.MAGNETOMETER:
      val = d.site_xmat[oid].T @ m.opt.magnetic.astype(dtype)
    elif st == _S.CLOCK:
      val = d.time[None]
    elif st == _S.RANGEFINDER:
      from dm_control_tpu.ops import ray as ray_ops
      val = ray_ops.rangefinder(m, d, oid)[None].astype(dtype)
    elif st in (_S.FRAMEPOS, _S.FRAMEQUAT, _S.FRAMEXAXIS, _S.FRAMEYAXIS,
                _S.FRAMEZAXIS, _S.FRAMELINVEL, _S.FRAMEANGVEL):
      ot = m.sensor_objtype[i]
      if ot == _OBJ.SITE:
        pos, mat, body = (d.site_xpos[oid], d.site_xmat[oid],
                          m.site_bodyid[oid])
        quat = mops.mat_to_quat(mat)
      elif ot == _OBJ.GEOM:
        pos, mat, body = (d.geom_xpos[oid], d.geom_xmat[oid],
                          m.geom_bodyid[oid])
        quat = mops.mat_to_quat(mat)
      else:
        pos, mat, body = d.xpos[oid], d.xmat[oid], oid
        quat = d.xquat[oid]
      if st == _S.FRAMEPOS:
        val = pos
      elif st == _S.FRAMEQUAT:
        val = quat
      elif st == _S.FRAMEXAXIS:
        val = mat[:, 0]
      elif st == _S.FRAMEYAXIS:
        val = mat[:, 1]
      elif st == _S.FRAMEZAXIS:
        val = mat[:, 2]
      elif st == _S.FRAMELINVEL:
        _, lin = _object_velocity(m, d, pos, body)
        val = lin
      else:
        ang, _ = _object_velocity(m, d, pos, body)
        val = ang
    elif st == _S.SUBTREECOM:
      val = d.subtree_com[oid]
    elif st == _S.SUBTREELINVEL:
      # subtree momentum / subtree mass
      r = d.xipos - d.subtree_com[
          jnp.array(m.body_rootid, dtype=jnp.int32)]
      vcom = d.cvel[:, 3:] + jnp.cross(d.cvel[:, :3], r)
      mom = m.subtree_mask[oid] @ (m.body_mass[:, None] * vcom)
      val = mom / jnp.maximum(m.body_subtreemass[oid], 1e-12)
    elif st == _S.SUBTREEANGMOM:
      root = jnp.array(m.body_rootid, dtype=jnp.int32)
      r_o = d.xipos - d.subtree_com[root]
      vcom = d.cvel[:, 3:] + jnp.cross(d.cvel[:, :3], r_o)
      com_s = d.subtree_com[oid]
      inert3 = (d.ximat * m.body_inertia[:, None, :]) @ (
          d.ximat.swapaxes(-1, -2))
      lb = (jnp.einsum('bij,bj->bi', inert3, d.cvel[:, :3]) +
            m.body_mass[:, None] * jnp.cross(d.xipos - com_s, vcom))
      val = m.subtree_mask[oid] @ lb
    else:
      val = jnp.zeros(dim, dtype=dtype)

    # cutoff clamp
    cutoff = m.sensor_cutoff[i]
    val = jnp.asarray(val, dtype=dtype).reshape(dim)
    val = jnp.where(cutoff > 0, jnp.clip(val, -cutoff, cutoff), val)
    out = out.at[adr:adr + dim].set(val)

  return d.replace(sensordata=out)
