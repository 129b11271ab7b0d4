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

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.models import constants
from dm_control_tpu.models.types import Data, Model
from dm_control_tpu.ops import linalg
from dm_control_tpu.ops import math as mops

_J = constants.JointType


# ---------------------------------------------------------------------------
# kinematics
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _fk_schedule(body_treelevel, body_parentid, body_jntadr, body_jntnum,
                 jnt_type):
  """Static level schedule for the vectorized FK sweep.

  Bodies at the same tree depth have independent updates, so the sweep is
  O(depth) traced vector ops instead of O(nbody) unrolled scalar chains —
  this is what keeps cold-compile time flat for wide models
  (humanoid_CMU: 31 bodies / depth 8; soccer scenes: hundreds of bodies).

  Returns [(ids, parents, slots)] per level; slots[s] maps joint type ->
  (local lane indices, joint ids) for the s-th joint of each body.
  """
  bylevel = {}
  for b in range(1, len(body_treelevel)):
    bylevel.setdefault(body_treelevel[b], []).append(b)
  out = []
  for lvl in sorted(bylevel):
    ids = np.asarray(bylevel[lvl], dtype=np.int32)
    parents = np.asarray([body_parentid[b] for b in ids], dtype=np.int32)
    maxj = max((body_jntnum[b] for b in ids), default=0)
    slots = []
    for s in range(maxj):
      groups = {}
      for li, b in enumerate(ids):
        if s < body_jntnum[b]:
          jid = body_jntadr[b] + s
          groups.setdefault(jnt_type[jid], ([], []))
          groups[jnt_type[jid]][0].append(li)
          groups[jnt_type[jid]][1].append(jid)
      slots.append({
          t: (np.asarray(l, dtype=np.int32), np.asarray(j, dtype=np.int32))
          for t, (l, j) in groups.items()})
    out.append((ids, parents, slots))
  return out


def kinematics(m: Model, d: Data) -> Data:
  """Forward kinematics: qpos -> body/geom/site frames + joint anchors.

  Level-parallel sweep: all bodies at one tree depth update in one set of
  vector ops (reference semantics: mj_kinematics, consumed through
  dm_control/mujoco/engine.py forward/step)."""
  qpos = d.qpos
  dtype = qpos.dtype

  xpos = jnp.zeros((m.nbody, 3), dtype=dtype)
  xquat = jnp.zeros((m.nbody, 4), dtype=dtype).at[:, 0].set(1.0)
  xanchor = jnp.zeros((m.njnt, 3), dtype=dtype)
  xaxis = jnp.zeros((m.njnt, 3), dtype=dtype)

  schedule = _fk_schedule(m.body_treelevel, m.body_parentid, m.body_jntadr,
                          m.body_jntnum, m.jnt_type)
  qposadr = np.asarray(m.jnt_qposadr, dtype=np.int32)
  for ids, parents, slots in schedule:
    pq = xquat[parents]
    pos = xpos[parents] + mops.rot_vec_quat(m.body_pos[ids], pq)
    quat = mops.mul_quat(pq, m.body_quat[ids])
    for slot in slots:
      for jt, (li, jid) in slot.items():
        qadr = qposadr[jid]
        if jt == _J.FREE:
          fpos = qpos[qadr[:, None] + np.arange(3)]
          fquat = mops.normalize_quat(
              qpos[qadr[:, None] + 3 + np.arange(4)])
          pos = pos.at[li].set(fpos)
          quat = quat.at[li].set(fquat)
          xanchor = xanchor.at[jid].set(fpos)
          xaxis = xaxis.at[jid].set(
              mops.rot_vec_quat(m.jnt_axis[jid], fquat))
        else:
          jpos = m.jnt_pos[jid]
          jaxis = m.jnt_axis[jid]
          q_l = quat[li]
          anchor = mops.rot_vec_quat(jpos, q_l) + pos[li]
          axis = mops.rot_vec_quat(jaxis, q_l)
          xanchor = xanchor.at[jid].set(anchor)
          xaxis = xaxis.at[jid].set(axis)
          if jt == _J.SLIDE:
            pos = pos.at[li].add(
                axis * (qpos[qadr] - m.qpos0[qadr])[:, None])
          elif jt == _J.BALL:
            qloc = mops.normalize_quat(qpos[qadr[:, None] + np.arange(4)])
            qn = mops.mul_quat(q_l, qloc)
            quat = quat.at[li].set(qn)
            pos = pos.at[li].set(anchor - mops.rot_vec_quat(jpos, qn))
          else:  # HINGE
            qloc = mops.axis_angle_to_quat(
                jaxis, qpos[qadr] - m.qpos0[qadr])
            qn = mops.mul_quat(q_l, qloc)
            quat = quat.at[li].set(qn)
            pos = pos.at[li].set(anchor - mops.rot_vec_quat(jpos, qn))
    # normalize per body after joint composition (oracle: mju_normalize4
    # after the per-body joint loop). Semantically required for long
    # chains; also keeps this graph out of an XLA:CPU fusion miscompile
    # observed on jax 0.9.0 (hinge-chain FK silently rotated ~0.017 rad
    # when qacc_smooth-derived outputs were live — see tests/
    # test_parity_flagships.py humanoid_CMU case).
    quat = mops.normalize_quat(quat)
    xpos = xpos.at[ids].set(pos)
    xquat = xquat.at[ids].set(quat)

  xmat = mops.quat_to_mat(xquat)
  xipos = xpos + mops.rot_vec_quat(m.body_ipos, xquat)
  ximat = mops.quat_to_mat(mops.mul_quat(xquat, m.body_iquat))

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
  # R diag(I) R^T written as a broadcast multiply-reduce: a 3x3 `@`
  # here lowers to an MXU dot with (3,3) trailing dims, whose (4,128)
  # tile padding makes every materialization ~57x its logical bytes on
  # TPU (and drags bf16 round-trip copies with it)
  scaled = d.ximat * m.body_inertia[:, None, :]
  inert3 = jnp.sum(scaled[..., :, None, :] * d.ximat[..., None, :, :],
                   axis=-1)
  cinert = mops.spatial_inertia(m.body_mass, inert3, offset)

  # com-frame dof axes, fully vectorized over nv: each dof's axis source
  # (constant e_k for free translations, an xmat column for rotational
  # free/ball dofs, xaxis for slide/hinge) is a static per-dof selection,
  # combined branch-free with 0/1 weights computed at trace time.
  if m.nv:
    sched = _cdof_schedule(m.nv, m.dof_jntid, m.jnt_type, m.jnt_bodyid,
                           m.jnt_dofadr, m.body_rootid)
    jids, bods, roots, col, w_slide, w_col, w_hinge, ek = sched
    axis_col = d.xmat[bods, :, col]                   # (nv, 3)
    axis_jnt = d.xaxis[jids]
    # angular part: the rotation axis (zero for translational dofs)
    ang = (jnp.asarray(w_col, dtype=dtype)[:, None] * axis_col +
           jnp.asarray(w_hinge, dtype=dtype)[:, None] * axis_jnt)
    offs = d.xanchor[jids] - subtree_com[roots]
    # linear part: e_k for free translations, cross(offs, axis) for
    # rotational dofs (ang is already zero elsewhere), axis for slides
    lin = (jnp.asarray(ek, dtype=dtype) + jnp.cross(offs, ang) +
           jnp.asarray(w_slide, dtype=dtype)[:, None] * axis_jnt)
    cdof = jnp.concatenate([ang, lin], axis=-1).astype(dtype)
  else:
    cdof = jnp.zeros((0, 6), dtype=dtype)

  return d.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


@functools.lru_cache(maxsize=64)
def _cdof_schedule(nv, dof_jntid, jnt_type, jnt_bodyid, jnt_dofadr,
                   body_rootid):
  """Static per-dof tables for the vectorized cdof computation."""
  jids = np.asarray(dof_jntid, dtype=np.int32)
  bods = np.asarray([jnt_bodyid[j] for j in jids], dtype=np.int32)
  roots = np.asarray([body_rootid[b] for b in bods], dtype=np.int32)
  t = np.asarray([jnt_type[j] for j in jids])
  k = np.arange(nv) - np.asarray([jnt_dofadr[j] for j in jids])
  free_trans = (t == _J.FREE) & (k < 3)          # constant e_k, no angular
  rot_col = ((t == _J.FREE) & (k >= 3)) | (t == _J.BALL)  # xmat column
  slide = t == _J.SLIDE                          # xaxis linear only
  hinge = t == _J.HINGE                          # xaxis + cross
  col = np.where(t == _J.FREE, k - 3, k).clip(0, 2).astype(np.int32)
  ek = np.where(free_trans[:, None], np.eye(3)[k.clip(0, 2)], 0.0)
  return (jids, bods, roots, col, slide.astype(np.float64),
          rot_col.astype(np.float64), hinge.astype(np.float64), ek)


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


@functools.lru_cache(maxsize=64)
def _jnt_type_groups(njnt, jnt_type, jnt_qposadr, jnt_dofadr):
  """Static (jids, qadr, vadr) triples for scalar / ball / free joints."""
  def grp(pred):
    jids = np.asarray([j for j in range(njnt) if pred(jnt_type[j])],
                      dtype=np.int32)
    return (jids,
            np.asarray([jnt_qposadr[j] for j in jids], dtype=np.int32),
            np.asarray([jnt_dofadr[j] for j in jids], dtype=np.int32))
  return (grp(lambda t: t in (_J.HINGE, _J.SLIDE)),
          grp(lambda t: t == _J.BALL),
          grp(lambda t: t == _J.FREE))


@functools.lru_cache(maxsize=64)
def _trn_schedule(nu, nv, actuator_trntype, actuator_trnid, jnt_type,
                  jnt_qposadr, jnt_dofadr):
  """Static transmission tables: scalar-joint / wide-joint / tendon."""
  scal_u, scal_q, scal_v = [], [], []
  wide_u, wide_v, wide_n = [], [], []
  ten_u, ten_t = [], []
  body_u, body_b = [], []
  for u in range(nu):
    trn = actuator_trntype[u]
    tid = actuator_trnid[u][0]
    if trn == constants.TrnType.JOINT:
      jt = jnt_type[tid]
      if jt in (_J.HINGE, _J.SLIDE):
        scal_u.append(u)
        scal_q.append(jnt_qposadr[tid])
        scal_v.append(jnt_dofadr[tid])
      else:
        wide_u.append(u)
        wide_v.append(jnt_dofadr[tid])
        wide_n.append(3 if jt == _J.BALL else 6)
    elif trn == constants.TrnType.TENDON:
      ten_u.append(u)
      ten_t.append(tid)
    elif trn == constants.TrnType.BODY:
      # adhesion actuators: moment rows come from contact normals
      # (computed dynamically in transmission(), see _adhesion_moments)
      body_u.append(u)
      body_b.append(tid)
    else:
      raise NotImplementedError(f'transmission type {trn}')
  arr = lambda x: np.asarray(x, dtype=np.int32)
  return (arr(scal_u), arr(scal_q), arr(scal_v),
          arr(wide_u), arr(wide_v), tuple(wide_n), arr(ten_u),
          arr(ten_t), arr(body_u), arr(body_b))


def transmission(m: Model, d: Data) -> Data:
  """Actuator lengths and moment rows (vectorized by transmission kind)."""
  if not m.nu:
    return d
  dtype = d.qpos.dtype
  (scal_u, scal_q, scal_v, wide_u, wide_v, wide_n, ten_u,
   ten_t, body_u, body_b) = _trn_schedule(
      m.nu, m.nv, m.actuator_trntype, m.actuator_trnid,
      m.jnt_type, m.jnt_qposadr, m.jnt_dofadr)
  lengths = jnp.zeros(m.nu, dtype=dtype)
  moments = jnp.zeros((m.nu, m.nv), dtype=dtype)
  if len(scal_u):
    gear0 = m.actuator_gear[scal_u, 0]
    lengths = lengths.at[scal_u].set(d.qpos[scal_q] * gear0)
    moments = moments.at[scal_u, scal_v].set(gear0)
  for u, vadr, n in zip(wide_u, wide_v, wide_n):
    # ball/free transmissions: torque about n local axes via gear[:n]
    moments = moments.at[u, vadr:vadr + n].set(
        m.actuator_gear[u, :n].astype(dtype))
  if len(ten_u):
    gear0 = m.actuator_gear[ten_u, 0]
    lengths = lengths.at[ten_u].set(d.ten_length[ten_t] * gear0)
    moments = moments.at[ten_u].set(d.ten_J[ten_t] * gear0[:, None])
  if len(body_u):
    moments = moments.at[body_u].set(
        _adhesion_moments(m, d, body_b, dtype))
  return d.replace(actuator_length=lengths, actuator_moment=moments)


def _adhesion_moments(m: Model, d: Data, body_b, dtype) -> jax.Array:
  """Moment rows for BODY-transmission (adhesion) actuators.

  Reference semantics (oracle mj_transmission, mjTRN_BODY): the moment
  is the mean of the contact-normal Jacobians over all current
  contacts that involve a geom of the target body, oriented so that a
  POSITIVE actuator force pulls the contacting bodies together
  (adhesion). Bodies with no active contacts get a zero row (the
  actuator has nothing to grip). Length is zero.
  """
  con = d.contact
  ns = con.dist.shape[0]
  if ns == 0:
    return jnp.zeros((len(body_b), m.nv), dtype=dtype)
  gbody = jnp.asarray(m.geom_bodyid, dtype=jnp.int32)
  b1 = gbody[con.geom1]                                 # (s,)
  b2 = gbody[con.geom2]
  # contact-normal translational Jacobian difference rows (nv, s),
  # same construction as the constraint assembly's normal rows
  bids = jnp.arange(m.nbody, dtype=jnp.int32)
  oh1 = (b1[:, None] == bids).astype(dtype)             # (s, nb)
  oh2 = (b2[:, None] == bids).astype(dtype)
  root_com = d.subtree_com[np.array(m.body_rootid)]     # (nb, 3)
  off1 = con.pos - oh1 @ root_com                       # (s, 3)
  off2 = con.pos - oh2 @ root_com
  bdm = jnp.asarray(m.body_dof_mask, dtype=dtype)       # (nb, nv)
  mask1_t = bdm.T @ oh1.T                               # (nv, s)
  mask2_t = bdm.T @ oh2.T
  dm_t = mask2_t - mask1_t
  ang, lin = d.cdof[:, :3], d.cdof[:, 3:]
  normal = con.frame[:, 0]                              # (s, 3)
  jn0 = jnp.zeros((m.nv, ns), dtype=dtype)
  for j in range(3):
    a, b = (j + 1) % 3, (j + 2) % 3
    qq_b = mask2_t * off2[None, :, b] - mask1_t * off1[None, :, b]
    qq_a = mask2_t * off2[None, :, a] - mask1_t * off1[None, :, a]
    jd_j = (dm_t * lin[:, j:j + 1] +
            ang[:, a:a + 1] * qq_b - ang[:, b:b + 1] * qq_a)
    jn0 = jn0 + normal[None, :, j] * jd_j
  # adhesion acts on all EXISTING contacts (dist < margin == the
  # includemargin band, oracle mujoco 3.10 semantics)
  exists = con.active.astype(dtype)
  bsel = jnp.asarray(np.asarray(body_b), dtype=jnp.int32)
  w = ((b1[None, :] == bsel[:, None]) |
       (b2[None, :] == bsel[:, None])).astype(dtype) * exists[None, :]
  cnt = jnp.maximum(jnp.sum(w, axis=-1), 1.0)           # (n_adh,)
  # jn0 is the separating direction (positive force pushes apart);
  # adhesion applies the opposite
  return -jnp.einsum('us,vs->uv', w, jn0) / cnt[:, None]


# ---------------------------------------------------------------------------
# passive forces
# ---------------------------------------------------------------------------


def passive(m: Model, d: Data) -> Data:
  """Spring/damper + medium (density/viscosity) passive forces."""
  dtype = d.qpos.dtype
  qfrc = jnp.zeros(m.nv, dtype=dtype)
  if m.opt.disableflags & constants.DisableBit.PASSIVE:
    return d.replace(qfrc_passive=qfrc)

  # joint springs, vectorized by joint-type group (static partition)
  scalar, ball, free = _jnt_type_groups(
      m.njnt, m.jnt_type, m.jnt_qposadr, m.jnt_dofadr)
  if len(scalar[0]):
    jids, qadr, vadr = scalar
    k = m.jnt_stiffness[jids]
    qfrc = qfrc.at[vadr].add(
        -k * (d.qpos[qadr] - m.qpos_spring[qadr]))
  if len(ball[0]):
    jids, qadr, vadr = ball
    k = m.jnt_stiffness[jids]
    q4 = qadr[:, None] + np.arange(4)
    dif = mops.quat_sub(d.qpos[q4], m.qpos_spring[q4])
    qfrc = qfrc.at[vadr[:, None] + np.arange(3)].add(-k[:, None] * dif)
  if len(free[0]):
    jids, qadr, vadr = free
    k = m.jnt_stiffness[jids]
    q3 = qadr[:, None] + np.arange(3)
    dif = d.qpos[q3] - m.qpos_spring[q3]
    qfrc = qfrc.at[vadr[:, None] + np.arange(3)].add(-k[:, None] * dif)
    q4 = qadr[:, None] + 3 + np.arange(4)
    difq = mops.quat_sub(d.qpos[q4], m.qpos_spring[q4])
    qfrc = qfrc.at[vadr[:, None] + 3 + np.arange(3)].add(
        -k[:, None] * difq)

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
