"""Smooth (unconstrained) dynamics: FK, COM frames, CRB, RNE, passive.

TPU-first formulation: instead of the reference engine's sequential
parent->child / child->parent sweeps, all tree accumulations are dense
matmuls against compile-time 0/1 structure masks:

    subtree sums    ->  subtree_mask   (nbody, nbody) @ per-body quantities
    chain prefixes  ->  body_dof_mask  (nbody, nv)    @ per-dof quantities
    CRB mass matrix ->  (nv,6)x(6,nv) masked matmul

Under vmap over thousands of envs these become large batched matmuls that
XLA tiles straight onto the MXU; only forward kinematics keeps a (static,
unrolled) loop over bodies.

Behavioural contract follows the mjModel/mjData semantics (reference:
dm_control/mujoco/engine.py step/forward pipeline).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dm_control_tpu.models import constants
from dm_control_tpu.models.types import Data, Model
from dm_control_tpu.ops import linalg
from dm_control_tpu.ops import math as mops

_J = constants.JointType


# ---------------------------------------------------------------------------
# kinematics
# ---------------------------------------------------------------------------


def kinematics(m: Model, d: Data) -> Data:
  """Forward kinematics: qpos -> body/geom/site frames + joint anchors."""
  qpos = d.qpos
  dtype = qpos.dtype
  zero3 = jnp.zeros(3, dtype=dtype)
  unitq = jnp.array([1.0, 0, 0, 0], dtype=dtype)

  xpos = [zero3]
  xquat = [unitq]
  xanchor = [None] * m.njnt
  xaxis = [None] * m.njnt

  for b in range(1, m.nbody):
    p = m.body_parentid[b]
    pos = xpos[p] + mops.rot_vec_quat(m.body_pos[b], xquat[p])
    quat = mops.mul_quat(xquat[p], m.body_quat[b])
    jadr, jnum = m.body_jntadr[b], m.body_jntnum[b]
    for ji in range(jadr, jadr + jnum):
      jt = m.jnt_type[ji]
      qadr = m.jnt_qposadr[ji]
      if jt == _J.FREE:
        pos = qpos[qadr:qadr + 3]
        quat = mops.normalize_quat(qpos[qadr + 3:qadr + 7])
        xanchor[ji] = pos
        xaxis[ji] = mops.rot_vec_quat(m.jnt_axis[ji], quat)
      else:
        anchor = mops.rot_vec_quat(m.jnt_pos[ji], quat) + pos
        axis = mops.rot_vec_quat(m.jnt_axis[ji], quat)
        xanchor[ji] = anchor
        xaxis[ji] = axis
        if jt == _J.BALL:
          qloc = mops.normalize_quat(qpos[qadr:qadr + 4])
          quat = mops.mul_quat(quat, qloc)
          pos = anchor - mops.rot_vec_quat(m.jnt_pos[ji], quat)
        elif jt == _J.SLIDE:
          pos = pos + axis * (qpos[qadr] - m.qpos0[qadr])
        else:  # HINGE
          qloc = mops.axis_angle_to_quat(
              m.jnt_axis[ji], qpos[qadr] - m.qpos0[qadr])
          quat = mops.mul_quat(quat, qloc)
          pos = anchor - mops.rot_vec_quat(m.jnt_pos[ji], quat)
    xpos.append(pos)
    xquat.append(quat)

  xpos = jnp.stack(xpos)
  xquat = jnp.stack(xquat)
  xmat = mops.quat_to_mat(xquat)
  xipos = xpos + mops.rot_vec_quat(m.body_ipos, xquat)
  ximat = mops.quat_to_mat(mops.mul_quat(xquat, m.body_iquat))

  if m.njnt:
    xanchor = jnp.stack(xanchor)
    xaxis = jnp.stack(xaxis)
  else:
    xanchor = jnp.zeros((0, 3), dtype=dtype)
    xaxis = jnp.zeros((0, 3), dtype=dtype)

  gb = jnp.array(m.geom_bodyid, dtype=jnp.int32)
  geom_xpos = xpos[gb] + mops.rot_vec_quat(m.geom_pos, xquat[gb])
  geom_xmat = mops.quat_to_mat(mops.mul_quat(xquat[gb], m.geom_quat))

  if m.nsite:
    sb = jnp.array(m.site_bodyid, dtype=jnp.int32)
    site_xpos = xpos[sb] + mops.rot_vec_quat(m.site_pos, xquat[sb])
    site_xmat = mops.quat_to_mat(mops.mul_quat(xquat[sb], m.site_quat))
  else:
    site_xpos = jnp.zeros((0, 3), dtype=dtype)
    site_xmat = jnp.zeros((0, 3, 3), dtype=dtype)

  return d.replace(
      xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
      xanchor=xanchor, xaxis=xaxis, geom_xpos=geom_xpos,
      geom_xmat=geom_xmat, site_xpos=site_xpos, site_xmat=site_xmat)


# ---------------------------------------------------------------------------
# com-based quantities
# ---------------------------------------------------------------------------


def com_pos(m: Model, d: Data) -> Data:
  """Subtree COM, com-frame spatial inertias, com-frame motion dofs."""
  dtype = d.qpos.dtype
  # subtree center of mass
  mass_xipos = m.body_mass[:, None] * d.xipos
  denom = jnp.maximum(m.body_subtreemass, 1e-12)
  subtree_com = (m.subtree_mask @ mass_xipos) / denom[:, None]
  # bodies with massless subtrees: fall back to own frame origin
  subtree_com = jnp.where(
      (m.body_subtreemass > 1e-12)[:, None], subtree_com, d.xpos)

  # spatial inertia of each body about subtree_com of its root
  rootid = jnp.array(m.body_rootid, dtype=jnp.int32)
  offset = d.xipos - subtree_com[rootid]
  inert3 = (d.ximat * m.body_inertia[:, None, :]) @ d.ximat.swapaxes(
      -1, -2)
  cinert = mops.spatial_inertia(m.body_mass, inert3, offset)

  # com-frame dof axes
  cdof = [None] * m.nv
  for ji in range(m.njnt):
    jt = m.jnt_type[ji]
    b = m.jnt_bodyid[ji]
    vadr = m.jnt_dofadr[ji]
    origin = subtree_com[m.body_rootid[b]]
    if jt == _J.FREE:
      for i in range(3):
        e = jnp.zeros(3, dtype=dtype).at[i].set(1.0)
        cdof[vadr + i] = jnp.concatenate([jnp.zeros(3, dtype=dtype), e])
      offs = d.xanchor[ji] - origin
      for i in range(3):
        axis = d.xmat[b, :, i]
        cdof[vadr + 3 + i] = jnp.concatenate(
            [axis, jnp.cross(offs, axis)])
    elif jt == _J.BALL:
      offs = d.xanchor[ji] - origin
      for i in range(3):
        axis = d.xmat[b, :, i]
        cdof[vadr + i] = jnp.concatenate([axis, jnp.cross(offs, axis)])
    elif jt == _J.SLIDE:
      cdof[vadr] = jnp.concatenate(
          [jnp.zeros(3, dtype=dtype), d.xaxis[ji]])
    else:  # HINGE
      offs = d.xanchor[ji] - origin
      axis = d.xaxis[ji]
      cdof[vadr] = jnp.concatenate([axis, jnp.cross(offs, axis)])
  cdof = (jnp.stack(cdof) if m.nv else jnp.zeros((0, 6), dtype=dtype))

  return d.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


def com_vel(m: Model, d: Data) -> Data:
  """Body spatial velocities and dof-axis time derivatives."""
  # cvel[b] = sum of cdof[d] qvel[d] over dofs on the path to b
  cdof_qvel = d.cdof * d.qvel[:, None]                    # (nv, 6)
  cvel = m.body_dof_mask @ cdof_qvel                      # (nbody, 6)
  # partial velocity seen by each dof (see builder.dof_vel_mask)
  vpart = m.dof_vel_mask @ cdof_qvel                      # (nv, 6)
  cdof_dot = mops.cross_motion(vpart, d.cdof)
  # translational dofs of free joints have constant axes
  if m.nv:
    keep = jnp.array(
        [0.0 if (m.jnt_type[m.dof_jntid[v]] == _J.FREE and
                 v - m.jnt_dofadr[m.dof_jntid[v]] < 3) else 1.0
         for v in range(m.nv)], dtype=d.qpos.dtype)
    cdof_dot = cdof_dot * keep[:, None]
  return d.replace(cvel=cvel, cdof_dot=cdof_dot)


# ---------------------------------------------------------------------------
# inertia matrix (CRB) and bias forces (RNE)
# ---------------------------------------------------------------------------


def crb(m: Model, d: Data) -> Data:
  """Composite-rigid-body inertia matrix, dense, one masked matmul."""
  # composite inertia per body: sum of cinert over subtree
  crb_inert = jnp.einsum('bc,cij->bij', m.subtree_mask, d.cinert)
  dofbody = jnp.array(m.dof_bodyid, dtype=jnp.int32)
  f = jnp.einsum('vij,vj->vi', crb_inert[dofbody], d.cdof)   # (nv, 6)
  raw = d.cdof @ f.T                                         # (nv, nv)
  # M[i, j] valid where j is ancestor-or-self of i: take lower-chain part
  lower = raw.T * m.dof_ancestor_mask                        # (nv, nv)
  qm = lower + lower.T - jnp.diag(jnp.diag(lower))
  qm = qm + jnp.diag(m.dof_armature)
  return d.replace(qM=qm)


def factor_m(m: Model, d: Data) -> Data:
  """Factor qM; stores the transposed inverse Cholesky factor.

  qLD holds Kt = (L^-1)^T (see ops/linalg.py): XLA's generic batched
  cholesky/triangular-solve path is ~500x slower than the unrolled
  factor-and-invert for these tiny matrices, and with the explicit
  inverse every downstream solve is two batched matvecs.
  """
  return d.replace(qLD=linalg.chol_inv_t(d.qM))


def solve_m(m: Model, d: Data, x: jax.Array) -> jax.Array:
  """Solve qM y = x using the cached inverse factor."""
  return linalg.kt_solve(d.qLD, x)


def mul_m(m: Model, d: Data, x: jax.Array) -> jax.Array:
  return d.qM @ x


def rne(m: Model, d: Data) -> Data:
  """Bias forces C(qpos, qvel): coriolis/centrifugal + gravity."""
  dtype = d.qpos.dtype
  gravity = jnp.where(
      m.opt.disableflags & constants.DisableBit.GRAVITY,
      jnp.zeros(3, dtype=dtype), m.opt.gravity.astype(dtype))
  cacc0 = jnp.concatenate([jnp.zeros(3, dtype=dtype), -gravity])
  # velocity-product accelerations accumulated down the chains
  cdd_qvel = d.cdof_dot * d.qvel[:, None]                  # (nv, 6)
  cacc = cacc0 + m.body_dof_mask @ cdd_qvel                # (nbody, 6)
  # per-body spatial force
  iv = jnp.einsum('bij,bj->bi', d.cinert, d.cvel)
  fb = jnp.einsum('bij,bj->bi', d.cinert, cacc) + mops.cross_force(
      d.cvel, iv)
  # subtree force sums, projected on the dofs
  ftot = m.subtree_mask @ fb                               # (nbody, 6)
  dofbody = jnp.array(m.dof_bodyid, dtype=jnp.int32)
  qfrc_bias = jnp.einsum('vi,vi->v', d.cdof, ftot[dofbody])
  return d.replace(qfrc_bias=qfrc_bias)


# ---------------------------------------------------------------------------
# jacobians
# ---------------------------------------------------------------------------


def jac(m: Model, d: Data, point: jax.Array, bodyid: int):
  """Dense translational/rotational jacobian of a world point on a body.

  Returns (jacp, jacr), each (3, nv).
  """
  rootid = m.body_rootid[bodyid]
  offset = point - d.subtree_com[rootid]
  ang = d.cdof[:, :3]                                     # (nv, 3)
  lin = d.cdof[:, 3:] + jnp.cross(ang, offset[None, :])
  mask = m.body_dof_mask[bodyid]                          # (nv,)
  return (lin * mask[:, None]).T, (ang * mask[:, None]).T


def jac_dyn(m: Model, d: Data, point: jax.Array, bodyid: jax.Array):
  """jac() with a traced bodyid (for vectorized contact rows)."""
  rootid = jnp.array(m.body_rootid, dtype=jnp.int32)[bodyid]
  offset = point - d.subtree_com[rootid]
  ang = d.cdof[:, :3]
  lin = d.cdof[:, 3:] + jnp.cross(ang, offset[None, :])
  mask = jnp.asarray(m.body_dof_mask)[bodyid]
  return (lin * mask[:, None]).T, (ang * mask[:, None]).T


def object_velocity(m: Model, d: Data, point: jax.Array, bodyid: int):
  """6D [ang; lin] velocity of a body-fixed world point, world frame."""
  rootid = m.body_rootid[bodyid]
  vel = d.cvel[bodyid]
  offset = point - d.subtree_com[rootid]
  return jnp.concatenate(
      [vel[:3], vel[3:] + jnp.cross(vel[:3], offset)])


# ---------------------------------------------------------------------------
# tendons
# ---------------------------------------------------------------------------


def tendon(m: Model, d: Data) -> Data:
  """Tendon lengths and moment arms (fixed + straight spatial paths)."""
  if not m.ntendon:
    return d
  dtype = d.qpos.dtype
  lengths = []
  jacs = []
  for t in range(m.ntendon):
    adr, num = m.tendon_adr[t], m.tendon_num[t]
    wtypes = m.wrap_type[adr:adr + num]
    if all(w == constants.WrapType.JOINT for w in wtypes):
      length = jnp.zeros((), dtype=dtype)
      j = jnp.zeros(m.nv, dtype=dtype)
      for k in range(num):
        jid = m.wrap_objid[adr + k]
        coef = m.wrap_prm[adr + k]
        qadr, vadr = m.jnt_qposadr[jid], m.jnt_dofadr[jid]
        length = length + coef * d.qpos[qadr]
        j = j.at[vadr].add(coef)
      lengths.append(length)
      jacs.append(j)
    else:
      # straight spatial path through sites
      length = jnp.zeros((), dtype=dtype)
      j = jnp.zeros(m.nv, dtype=dtype)
      for k in range(num - 1):
        s1 = m.wrap_objid[adr + k]
        s2 = m.wrap_objid[adr + k + 1]
        p1, p2 = d.site_xpos[s1], d.site_xpos[s2]
        dif = p2 - p1
        seg = jnp.linalg.norm(dif)
        unit = dif / jnp.maximum(seg, 1e-12)
        length = length + seg
        jp1, _ = jac(m, d, p1, m.site_bodyid[s1])
        jp2, _ = jac(m, d, p2, m.site_bodyid[s2])
        j = j + unit @ (jp2 - jp1)
      lengths.append(length)
      jacs.append(j)
  ten_length = jnp.stack(lengths)
  ten_j = jnp.stack(jacs)
  return d.replace(ten_length=ten_length, ten_J=ten_j)


def tendon_vel(m: Model, d: Data) -> Data:
  if not m.ntendon:
    return d
  return d.replace(ten_velocity=d.ten_J @ d.qvel)


# ---------------------------------------------------------------------------
# actuator transmission
# ---------------------------------------------------------------------------


def transmission(m: Model, d: Data) -> Data:
  """Actuator lengths and moment rows."""
  if not m.nu:
    return d
  dtype = d.qpos.dtype
  lengths = []
  moments = []
  for u in range(m.nu):
    trn = m.actuator_trntype[u]
    tid = m.actuator_trnid[u][0]
    gear0 = m.actuator_gear[u, 0]
    if trn == constants.TrnType.JOINT:
      jt = m.jnt_type[tid]
      qadr, vadr = m.jnt_qposadr[tid], m.jnt_dofadr[tid]
      if jt in (_J.HINGE, _J.SLIDE):
        lengths.append(d.qpos[qadr] * gear0)
        moments.append(jnp.zeros(m.nv, dtype=dtype).at[vadr].set(gear0))
      elif jt == _J.BALL:
        # torque about the 3 local rotation axes, weighted by gear[:3]
        lengths.append(jnp.zeros((), dtype=dtype))
        mom = jnp.zeros(m.nv, dtype=dtype)
        for i in range(3):
          mom = mom.at[vadr + i].set(m.actuator_gear[u, i])
        moments.append(mom)
      else:  # FREE
        lengths.append(jnp.zeros((), dtype=dtype))
        mom = jnp.zeros(m.nv, dtype=dtype)
        for i in range(6):
          mom = mom.at[vadr + i].set(m.actuator_gear[u, i])
        moments.append(mom)
    elif trn == constants.TrnType.TENDON:
      lengths.append(d.ten_length[tid] * gear0)
      moments.append(d.ten_J[tid] * gear0)
    else:
      raise NotImplementedError(f'transmission type {trn}')
  return d.replace(
      actuator_length=jnp.stack(lengths),
      actuator_moment=jnp.stack(moments))


# ---------------------------------------------------------------------------
# passive forces
# ---------------------------------------------------------------------------


def passive(m: Model, d: Data) -> Data:
  """Spring/damper + medium (density/viscosity) passive forces."""
  dtype = d.qpos.dtype
  qfrc = jnp.zeros(m.nv, dtype=dtype)
  if m.opt.disableflags & constants.DisableBit.PASSIVE:
    return d.replace(qfrc_passive=qfrc)

  # joint springs
  for ji in range(m.njnt):
    jt = m.jnt_type[ji]
    qadr, vadr = m.jnt_qposadr[ji], m.jnt_dofadr[ji]
    k = m.jnt_stiffness[ji]
    if jt in (_J.HINGE, _J.SLIDE):
      qfrc = qfrc.at[vadr].add(-k * (d.qpos[qadr] - m.qpos_spring[qadr]))
    elif jt == _J.BALL:
      dif = mops.quat_sub(d.qpos[qadr:qadr + 4],
                          m.qpos_spring[qadr:qadr + 4])
      qfrc = qfrc.at[vadr:vadr + 3].add(-k * dif)
    else:  # FREE
      dif = d.qpos[qadr:qadr + 3] - m.qpos_spring[qadr:qadr + 3]
      qfrc = qfrc.at[vadr:vadr + 3].add(-k * dif)
      difq = mops.quat_sub(d.qpos[qadr + 3:qadr + 7],
                           m.qpos_spring[qadr + 3:qadr + 7])
      qfrc = qfrc.at[vadr + 3:vadr + 6].add(-k * difq)

  # dof damping
  qfrc = qfrc - m.dof_damping * d.qvel

  # tendon spring/damper
  if m.ntendon:
    ref = jnp.where(m.tendon_lengthspring[:, 0] < 0,
                    m.tendon_length0, m.tendon_lengthspring[:, 0])
    frc = -m.tendon_stiffness * (d.ten_length - ref)
    frc = frc - m.tendon_damping * d.ten_velocity
    qfrc = qfrc + d.ten_J.T @ frc

  # fluid forces (inertia-box model)
  density = m.opt.density.astype(dtype)
  viscosity = m.opt.viscosity.astype(dtype)
  has_fluid = True  # traced values; contribution vanishes when both are 0
  if has_fluid:
    rootid = jnp.array(m.body_rootid, dtype=jnp.int32)
    offset = d.xipos - d.subtree_com[rootid]
    # velocity of body com, world frame
    vang = d.cvel[:, :3]
    vlin = d.cvel[:, 3:] + jnp.cross(vang, offset)
    vlin = vlin - m.opt.wind.astype(dtype)[None, :]
    # local (inertial) frame
    lvel = jnp.einsum('bij,bj->bi', d.ximat.swapaxes(-1, -2), vlin)
    lang = jnp.einsum('bij,bj->bi', d.ximat.swapaxes(-1, -2), vang)
    # equivalent inertia box (full widths)
    inert = m.body_inertia
    mass = jnp.maximum(m.body_mass, 1e-12)
    ii = jnp.stack([
        inert[:, 1] + inert[:, 2] - inert[:, 0],
        inert[:, 0] + inert[:, 2] - inert[:, 1],
        inert[:, 0] + inert[:, 1] - inert[:, 2],
    ], axis=-1)
    box = jnp.sqrt(jnp.maximum(6.0 * ii / mass[:, None], 1e-12))
    has_mass = (m.body_mass > 1e-12).astype(dtype)[:, None]

    # viscous resistance (equivalent sphere)
    diam = jnp.mean(box, axis=-1, keepdims=True)
    ltrq = -jnp.pi * diam ** 3 * viscosity * lang
    lfrc = -3.0 * jnp.pi * diam * viscosity * lvel
    # quadratic drag
    b0, b1, b2 = box[:, 0:1], box[:, 1:2], box[:, 2:3]
    area = jnp.concatenate([b1 * b2, b0 * b2, b0 * b1], axis=-1)
    lfrc = lfrc - 0.5 * density * area * jnp.abs(lvel) * lvel
    brot = jnp.concatenate([
        b0 * (b1 ** 4 + b2 ** 4), b1 * (b0 ** 4 + b2 ** 4),
        b2 * (b0 ** 4 + b1 ** 4)], axis=-1)
    ltrq = ltrq - density * brot * jnp.abs(lang) * lang / 64.0
    ltrq = ltrq * has_mass
    lfrc = lfrc * has_mass

    # back to world, then to com-frame spatial force
    wtrq = jnp.einsum('bij,bj->bi', d.ximat, ltrq)
    wfrc = jnp.einsum('bij,bj->bi', d.ximat, lfrc)
    fs = jnp.concatenate([wtrq + jnp.cross(offset, wfrc), wfrc], axis=-1)
    ftot = m.subtree_mask @ fs
    dofbody = jnp.array(m.dof_bodyid, dtype=jnp.int32)
    qfrc_fluid = jnp.einsum('vi,vi->v', d.cdof, ftot[dofbody])
    qfrc = qfrc + qfrc_fluid

  return d.replace(qfrc_passive=qfrc)
