"""Constraint assembly and the primal Newton solver.

Row layout is a compile-time constant (equality -> joint limits -> tendon
limits -> contact rows), padded to `nefc_max`. Inactive rows participate
with zero weight, keeping all shapes static.

The solver minimizes the strictly convex piecewise-quadratic primal

    0.5 (x - a0)' M (x - a0) + 0.5 sum_i D_i s_i(J_i x - aref_i)^2

over qacc x, where s_i clamps inactive inequality rows, via damped Newton
steps with an exact (piecewise-quadratic) line search — the same
soft-constraint model the reference engine exposes through solref/solimp
(see reference dm_control/mujoco/engine.py step semantics).
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.models import constants
from dm_control_tpu.models.types import Data, Model
from dm_control_tpu.ops import linalg
from dm_control_tpu.ops import math as mops
from dm_control_tpu.ops import smooth

_J = constants.JointType


class _Rows(NamedTuple):
  J: jax.Array        # (nv, nefc) — TRANSPOSED layout: every hot einsum
                      # (jar, grad, H, jp) then contracts over a minor
                      # axis, which XLA lowers without transposes
  pos: jax.Array      # (nefc,) position residual
  margin: jax.Array   # (nefc,)
  solref: jax.Array   # (nefc, 2)
  solimp: jax.Array   # (nefc, 5)
  invweight: jax.Array  # (nefc,) diag approximation of J M^-1 J'
  eq_mask: jax.Array  # (nefc,) 1.0 for always-active (equality) rows
  slot_active: jax.Array  # (nefc,) 1.0 if row exists this step
  frictionloss: jax.Array  # reserved
  mu: jax.Array       # (nefc,) circularized friction coef, elliptic
                      # contact rows only (0 elsewhere)


def _elliptic_groups(m: Model):
  """Static [(row_start, nslots, condim)] for elliptic contact blocks.

  Elliptic contacts emit condim raw rows per slot (normal + scaled
  friction axes, see make_rows); the solver treats each block with the
  exact cone cost (oracle: engine_core_constraint.c, elliptic branch).
  Empty for pyramidal models — every caller then takes the fast
  row-independent path.
  """
  if int(m.opt.cone) != int(constants.ConeType.ELLIPTIC):
    return []
  if (m.opt.disableflags & constants.DisableBit.CONTACT) or not m.ncon_sel:
    return []
  idx = _num_noncontact_rows(m)
  out = []
  for c in _contact_condim_groups(m):
    k = sum(1 for s in range(m.ncon_sel) if m.sel_condim[s] == c)
    if c == 1:
      idx += k
    else:
      out.append((idx, k, c))
      idx += k * c
  return out


def _elliptic_spring_scale(m: Model, nefc: int):
  """Static (nefc,) 0/1 mask: 0 on elliptic friction rows, whose aref
  has no position-spring term (their constraint 'pos' is 0 in the
  oracle; we carry the contact depth there so the impedance still
  follows penetration)."""
  mask = np.ones(nefc)
  for (s0, k, c) in _elliptic_groups(m):
    blk = np.ones((k, c))
    blk[:, 1:] = 0.0
    mask[s0:s0 + k * c] = blk.reshape(-1)
  return mask


# ---------------------------------------------------------------------------
# cone-aware row functions
#
# The Newton solver only touches constraint rows through four maps:
# force f(jar), Gauss-Newton weights/rows for H, per-row cost, and the
# line-search directional terms. For pyramidal models every map is
# row-independent; elliptic contacts couple each contact's `condim`
# rows through the exact cone zones (top: separating, no force;
# bottom: inside the polar cone, all components penalized; middle:
# sliding, cost = 0.5 D (mu T - N)^2 / (1 + mu^2), the weighted
# distance-to-cone — oracle engine_core_constraint.c).
# ---------------------------------------------------------------------------


def _ell_block(x, s0, k, c):
  return x[..., s0:s0 + k * c].reshape(x.shape[:-1] + (k, c))


def _ell_zones(ub, mub):
  N = ub[..., 0]
  uT = ub[..., 1:]
  T = jnp.sqrt(jnp.sum(uT * uT, axis=-1) + 1e-24)
  top = N >= mub * T
  bottom = mub * N + T <= 0.0
  s = mub * T - N
  return N, uT, T, top, bottom, s


def _row_force_cone(jar, dweight, eq, fric, floss, mu, groups):
  pen = -dweight * jar
  base = jnp.where(eq | (jar < 0), pen, 0.0)
  out = jnp.where(fric, jnp.clip(pen, -floss, floss), base)
  for (s0, k, c) in groups:
    ub = _ell_block(jar, s0, k, c)
    Db = _ell_block(dweight, s0, k, c)[..., 0]
    mub = _ell_block(mu, s0, k, c)[..., 0]
    N, uT, T, top, bottom, s = _ell_zones(ub, mub)
    f_bot = -Db[..., None] * ub
    coef = Db * s / (1.0 + mub * mub)
    f_mid = jnp.concatenate(
        [coef[..., None], (-coef * mub / T)[..., None] * uT], axis=-1)
    fb = jnp.where(top[..., None], 0.0,
                   jnp.where(bottom[..., None], f_bot, f_mid))
    out = out.at[..., s0:s0 + k * c].set(
        fb.reshape(fb.shape[:-2] + (k * c,)))
  return out


def _cost_rows_cone(jar, dweight, eq, fric, floss, mu, groups):
  w_base = jnp.where(eq | (jar < 0), dweight, 0.0)
  quad = 0.5 * w_base * jar * jar
  quad_fr = 0.5 * dweight * jar * jar
  lin_fr = (floss * jnp.abs(jar) -
            0.5 * floss * floss / jnp.maximum(dweight, 1e-12))
  cost_fr = jnp.where(jnp.abs(dweight * jar) < floss, quad_fr, lin_fr)
  rowcost = jnp.where(fric, cost_fr, quad)
  for (s0, k, c) in groups:
    ub = _ell_block(jar, s0, k, c)
    Db = _ell_block(dweight, s0, k, c)[..., 0]
    mub = _ell_block(mu, s0, k, c)[..., 0]
    N, uT, T, top, bottom, s = _ell_zones(ub, mub)
    c_bot = 0.5 * Db * jnp.sum(ub * ub, axis=-1)
    c_mid = 0.5 * Db * s * s / (1.0 + mub * mub)
    cb = jnp.where(top, 0.0, jnp.where(bottom, c_bot, c_mid))
    blk = jnp.zeros_like(ub)
    blk = blk.at[..., 0].set(cb)
    rowcost = rowcost.at[..., s0:s0 + k * c].set(
        blk.reshape(blk.shape[:-2] + (k * c,)))
  return rowcost


def _hess_cone(jar, J, dweight, eq, fric, floss, mu, groups):
  """Gauss-Newton weights w and (possibly transformed) rows Jh with
  H = M + Jh diag(w) Jh'. Middle-zone elliptic contacts contribute one
  rank-1 term along the cone-distance gradient; its combined row
  replaces the block's normal row."""
  w_base = jnp.where(eq | (jar < 0), dweight, 0.0)
  w_fr = jnp.where(jnp.abs(dweight * jar) < floss, dweight, 0.0)
  w = jnp.where(fric, w_fr, w_base)
  Jh = J
  for (s0, k, c) in groups:
    ub = _ell_block(jar, s0, k, c)
    Db = _ell_block(dweight, s0, k, c)[..., 0]
    mub = _ell_block(mu, s0, k, c)[..., 0]
    N, uT, T, top, bottom, s = _ell_zones(ub, mub)
    middle = (~top) & (~bottom)
    g = jnp.concatenate(
        [-jnp.ones_like(N)[..., None], (mub / T)[..., None] * uT],
        axis=-1)                                     # (..., k, c)
    Jb = J[..., s0:s0 + k * c].reshape(J.shape[:-1] + (k, c))
    comb = jnp.einsum('...vkc,...kc->...vk', Jb, g)
    newrow = jnp.where(middle[..., None, :], comb, Jb[..., 0])
    cols = s0 + np.arange(k) * c
    Jh = Jh.at[..., cols].set(newrow)
    w_n = jnp.where(middle, Db / (1.0 + mub * mub),
                    jnp.where(bottom, Db, 0.0))
    w_f = jnp.where(bottom[..., None], Db[..., None],
                    jnp.zeros_like(ub[..., 1:]))
    wb = jnp.concatenate([w_n[..., None], w_f], axis=-1)
    w = w.at[..., s0:s0 + k * c].set(
        wb.reshape(wb.shape[:-2] + (k * c,)))
  return w, Jh


def _ls_rows_cone(ra, jp, dweight, eq, fric, floss, mu, groups):
  """Per-row (f(ra)·jp, w(ra)·jp²) terms for the exact line search."""
  pen = -dweight * ra
  base = jnp.where(eq | (ra < 0), pen, 0.0)
  f = jnp.where(fric, jnp.clip(pen, -floss, floss), base)
  w_base = jnp.where(eq | (ra < 0), dweight, 0.0)
  w_fr = jnp.where(jnp.abs(dweight * ra) < floss, dweight, 0.0)
  w = jnp.where(fric, w_fr, w_base)
  dphi = f * jp
  ddphi = w * jp * jp
  for (s0, k, c) in groups:
    ub = _ell_block(ra, s0, k, c)
    jpb = _ell_block(jp, s0, k, c)
    Db = _ell_block(dweight, s0, k, c)[..., 0]
    mub = _ell_block(mu, s0, k, c)[..., 0]
    N, uT, T, top, bottom, s = _ell_zones(ub, mub)
    middle = (~top) & (~bottom)
    f_bot = -Db[..., None] * ub
    coef = Db * s / (1.0 + mub * mub)
    f_mid = jnp.concatenate(
        [coef[..., None], (-coef * mub / T)[..., None] * uT], axis=-1)
    fb = jnp.where(top[..., None], 0.0,
                   jnp.where(bottom[..., None], f_bot, f_mid))
    fdotjp = jnp.sum(fb * jpb, axis=-1)              # (..., k)
    gdotjp = (-jpb[..., 0] +
              mub / T * jnp.sum(uT * jpb[..., 1:], axis=-1))
    curv = jnp.where(
        middle, Db / (1.0 + mub * mub) * gdotjp * gdotjp,
        jnp.where(bottom, Db * jnp.sum(jpb * jpb, axis=-1), 0.0))
    dblk = jnp.zeros_like(ub)
    dblk = dblk.at[..., 0].set(fdotjp)
    wblk = jnp.zeros_like(ub)
    wblk = wblk.at[..., 0].set(curv)
    dphi = dphi.at[..., s0:s0 + k * c].set(
        dblk.reshape(dblk.shape[:-2] + (k * c,)))
    ddphi = ddphi.at[..., s0:s0 + k * c].set(
        wblk.reshape(wblk.shape[:-2] + (k * c,)))
  return dphi, ddphi


def _impedance(solimp, pos):
  """Constraint impedance d(pos) from solimp = (d0, dmax, width, mid, pw)."""
  d0, dmax, width, mid, power = (
      solimp[..., 0], solimp[..., 1], solimp[..., 2], solimp[..., 3],
      solimp[..., 4])
  # oracle clamps the endpoints into [MINIMP, MAXIMP] BEFORE the
  # sigmoid interpolation (so d0=0 acts as 1e-4, shifting the whole
  # curve), not just the final value.
  d0 = jnp.clip(d0, constants.MINIMP, constants.MAXIMP)
  dmax = jnp.clip(dmax, constants.MINIMP, constants.MAXIMP)
  x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, 1e-12), 0.0, 1.0)
  mid = jnp.clip(mid, 0.0001, 0.9999)
  power = jnp.maximum(power, 1.0)
  a = 1.0 / jnp.power(mid, power - 1.0)
  b = 1.0 / jnp.power(1.0 - mid, power - 1.0)
  y = jnp.where(x < mid,
                a * jnp.power(x, power),
                1.0 - b * jnp.power(1.0 - x, power))
  d = d0 + y * (dmax - d0)
  return jnp.clip(d, constants.MINIMP, constants.MAXIMP)


def _kbip(m, solref, solimp, imp, pos_minus_margin, vel):
  """Reference acceleration aref and regularizer R per row."""
  dmax = solimp[..., 1]
  timeconst = solref[..., 0]
  dampratio = solref[..., 1]
  if not (m.opt.disableflags & constants.DisableBit.REFSAFE):
    # refsafe: keep the virtual spring resolvable at this timestep
    # (applies only to the standard, positive-timeconst form)
    timeconst = jnp.maximum(timeconst, 2.0 * m.opt.timestep.astype(
        timeconst.dtype))
  b_std = 2.0 / jnp.maximum(dmax * timeconst, 1e-12)
  k_std = 1.0 / jnp.maximum(
      dmax * dmax * timeconst * timeconst * dampratio * dampratio, 1e-12)
  # direct (non-positive) solref entries specify stiffness/damping
  # directly, scaled by 1/dmax^2 and 1/dmax respectively; each element
  # is gated independently (oracle getKBIP, engine_core_constraint.c)
  dmax_sq = jnp.maximum(dmax * dmax, 1e-12)
  b = jnp.where(solref[..., 1] <= 0,
                -solref[..., 1] / jnp.maximum(dmax, 1e-12), b_std)
  k = jnp.where(solref[..., 0] <= 0, -solref[..., 0] / dmax_sq, k_std)
  aref = -b * vel - k * imp * pos_minus_margin
  return aref


def make_rows(m: Model, d: Data) -> _Rows:
  """Assemble all constraint rows (trace-time static structure)."""
  dtype = d.qpos.dtype
  nv = m.nv
  rows_J: List[jax.Array] = []
  rows_pos: List[jax.Array] = []
  rows_margin: List[jax.Array] = []
  rows_solref: List[jax.Array] = []
  rows_solimp: List[jax.Array] = []
  rows_iw: List[jax.Array] = []
  rows_eq: List[float] = []
  rows_active: List[jax.Array] = []
  rows_floss: List[jax.Array] = []

  one = jnp.ones((), dtype=dtype)
  disable = m.opt.disableflags

  def add(J, pos, margin, solref, solimp, iw, eq, active):
    rows_J.append(J)
    rows_pos.append(pos)
    rows_margin.append(margin * one)
    rows_solref.append(solref)
    rows_solimp.append(solimp)
    rows_iw.append(iw)
    rows_eq.append(eq)
    rows_active.append(active * one)
    rows_floss.append(0.0 * one)

  elliptic = int(m.opt.cone) == int(constants.ConeType.ELLIPTIC)

  # ---------------- equality ----------------
  if not (disable & constants.DisableBit.EQUALITY):
    for e in range(m.neq):
      et = m.eq_type[e]
      act = m.eq_active0[e]
      if et == constants.EqType.CONNECT:
        b1, b2 = m.eq_obj1id[e], m.eq_obj2id[e]
        anchor = m.eq_data[e, :3].astype(dtype)
        p1 = d.xpos[b1] + d.xmat[b1] @ anchor
        p2 = d.xpos[b2] + d.xmat[b2] @ (
            d.xmat[b2].T @ (p1 - d.xpos[b2]))  # placeholder same point
        # anchor defined in body1 frame; body2 side uses its own mapping
        # of the world point at qpos0 — standard connect keeps both
        # points coincident; here anchor2 = anchor expressed in body2.
        p2 = d.xpos[b2] + d.xmat[b2] @ m.eq_data[e, 3:6].astype(dtype)
        jac1p, _ = smooth.jac(m, d, p1, b1)
        jac2p, _ = smooth.jac(m, d, p2, b2)
        jdiff = jac1p - jac2p
        cpos = p1 - p2
        iw = (m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0])
        for i in range(3):
          add(jdiff[i], cpos[i], 0.0, m.eq_solref[e], m.eq_solimp[e],
              iw, 1.0, act)
      elif et == constants.EqType.WELD:
        b1, b2 = m.eq_obj1id[e], m.eq_obj2id[e]
        relpos = m.eq_data[e, 3:6].astype(dtype)
        relquat = m.eq_data[e, 6:10].astype(dtype)
        p1 = d.xpos[b1]
        p2 = d.xpos[b2] + d.xmat[b2] @ relpos
        jac1p, jac1r = smooth.jac(m, d, p1, b1)
        jac2p, jac2r = smooth.jac(m, d, p2, b2)
        cpos = p1 - p2
        iw_t = (m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0])
        iw_r = (m.body_invweight0[b1, 1] + m.body_invweight0[b2, 1])
        for i in range(3):
          add((jac1p - jac2p)[i], cpos[i], 0.0, m.eq_solref[e],
              m.eq_solimp[e], iw_t, 1.0, act)
        # orientation residual
        q2 = mops.mul_quat(d.xquat[b2], relquat)
        qdif = mops.quat_sub(d.xquat[b1], q2)
        torquescale = m.eq_data[e, 10].astype(dtype)
        for i in range(3):
          add((jac1r - jac2r)[i] * torquescale, qdif[i] * torquescale,
              0.0, m.eq_solref[e], m.eq_solimp[e], iw_r, 1.0, act)
      elif et == constants.EqType.JOINT:
        j1 = m.eq_obj1id[e]
        j2 = m.eq_obj2id[e]
        poly = m.eq_data[e, :5].astype(dtype)
        q1adr, v1adr = m.jnt_qposadr[j1], m.jnt_dofadr[j1]
        J = jnp.zeros(nv, dtype=dtype).at[v1adr].set(1.0)
        if j2 >= 0:
          q2adr, v2adr = m.jnt_qposadr[j2], m.jnt_dofadr[j2]
          dif = d.qpos[q2adr] - m.qpos0[q2adr]
          powers = jnp.stack([dif ** i for i in range(5)])
          rhs = poly @ powers
          deriv = poly[1:] @ jnp.stack(
              [i * dif ** (i - 1) for i in range(1, 5)])
          J = J.at[v2adr].set(-deriv)
          pos = d.qpos[q1adr] - m.qpos0[q1adr] - rhs
          iw = m.dof_invweight0[v1adr] + m.dof_invweight0[v2adr]
        else:
          pos = d.qpos[q1adr] - m.qpos0[q1adr] - poly[0]
          iw = m.dof_invweight0[v1adr]
        add(J, pos, 0.0, m.eq_solref[e], m.eq_solimp[e], iw, 1.0, act)
      elif et == constants.EqType.TENDON:
        t1 = m.eq_obj1id[e]
        poly0 = m.eq_data[e, 0].astype(dtype)
        add(d.ten_J[t1],
            d.ten_length[t1] - m.tendon_length0[t1] - poly0, 0.0,
            m.eq_solref[e], m.eq_solimp[e], m.tendon_invweight0[t1],
            1.0, act)

  # ---------------- stack scalar rows collected so far ----------------
  # (the equality loop above appends per-row; limit/frictionloss rows
  # below are assembled as vectorized blocks directly into parts_*)
  vec_parts = []   # list of dicts appended after the equality block

  # ---------------- dof friction loss (vectorized block) -------------
  if not (disable & constants.DisableBit.FRICTIONLOSS):
    fl_v = np.asarray([v for v in range(m.nv)
                       if _dof_has_frictionloss(m, v)], dtype=np.int32)
    k = len(fl_v)
    if k:
      Jblk = np.zeros((nv, k))
      Jblk[fl_v, np.arange(k)] = 1.0
      vec_parts.append(dict(
          J=jnp.asarray(Jblk, dtype=dtype),
          pos=jnp.zeros(k, dtype=dtype),
          margin=jnp.zeros(k, dtype=dtype),
          solref=jnp.tile(jnp.array([0.02, 1.0], dtype=dtype), (k, 1)),
          solimp=jnp.tile(
              jnp.array([0.9, 0.95, 0.001, 0.5, 2.0], dtype=dtype),
              (k, 1)),
          iw=m.dof_invweight0[fl_v].astype(dtype),
          eq=jnp.full(k, 2.0, dtype=dtype),  # 2.0 marks a friction row
          active=jnp.ones(k, dtype=dtype),
          floss=m.dof_frictionloss[fl_v].astype(dtype)))

  # ---------------- joint limits (vectorized blocks) ------------------
  if not (disable & constants.DisableBit.LIMIT):
    lim = [j for j in range(m.njnt) if m.jnt_limited[j]]
    sl_j = np.asarray([j for j in lim
                       if m.jnt_type[j] in (_J.HINGE, _J.SLIDE)],
                      dtype=np.int32)
    ball_j = np.asarray([j for j in lim if m.jnt_type[j] == _J.BALL],
                        dtype=np.int32)
    if len(sl_j):
      qadr = np.asarray([m.jnt_qposadr[j] for j in sl_j])
      vadr = np.asarray([m.jnt_dofadr[j] for j in sl_j])
      k = len(sl_j)
      q = d.qpos[qadr]
      lo = q - m.jnt_range[sl_j, 0]
      hi = m.jnt_range[sl_j, 1] - q
      dist = jnp.minimum(lo, hi)
      sign = jnp.where(lo < hi, 1.0, -1.0).astype(dtype)
      onehot = np.zeros((nv, k))
      onehot[vadr, np.arange(k)] = 1.0
      Jblk = jnp.asarray(onehot, dtype=dtype) * sign[None, :]
      vec_parts.append(dict(
          J=Jblk, pos=dist, margin=m.jnt_margin[sl_j].astype(dtype),
          solref=m.jnt_solref[sl_j].astype(dtype),
          solimp=m.jnt_solimp[sl_j].astype(dtype),
          iw=m.dof_invweight0[vadr].astype(dtype),
          eq=jnp.zeros(k, dtype=dtype),
          active=(dist < m.jnt_margin[sl_j]).astype(dtype),
          floss=jnp.zeros(k, dtype=dtype)))
    if len(ball_j):
      # limit on total rotation angle
      qadr = np.asarray([m.jnt_qposadr[j] for j in ball_j])
      vadr = np.asarray([m.jnt_dofadr[j] for j in ball_j])
      k = len(ball_j)
      q4 = d.qpos[qadr[:, None] + np.arange(4)]
      axisangle = mops.quat_to_vel(q4)                    # (k, 3)
      angle = jnp.linalg.norm(axisangle, axis=-1)
      axis = axisangle / jnp.maximum(angle, 1e-12)[:, None]
      limit = jnp.maximum(jnp.abs(m.jnt_range[ball_j, 0]),
                          jnp.abs(m.jnt_range[ball_j, 1]))
      dist = limit - angle
      Jblk = jnp.zeros((nv, k), dtype=dtype).at[
          vadr[:, None] + np.arange(3), np.arange(k)[:, None]].set(-axis)
      vec_parts.append(dict(
          J=Jblk, pos=dist, margin=m.jnt_margin[ball_j].astype(dtype),
          solref=m.jnt_solref[ball_j].astype(dtype),
          solimp=m.jnt_solimp[ball_j].astype(dtype),
          iw=m.dof_invweight0[vadr].astype(dtype),
          eq=jnp.zeros(k, dtype=dtype),
          active=(dist < m.jnt_margin[ball_j]).astype(dtype),
          floss=jnp.zeros(k, dtype=dtype)))

  # ---------------- tendon limits (vectorized block) ------------------
  if not (disable & constants.DisableBit.LIMIT):
    tl = np.asarray([t for t in range(m.ntendon) if m.tendon_limited[t]],
                    dtype=np.int32)
    if len(tl):
      k = len(tl)
      lo = d.ten_length[tl] - m.tendon_range[tl, 0]
      hi = m.tendon_range[tl, 1] - d.ten_length[tl]
      dist = jnp.minimum(lo, hi)
      sign = jnp.where(lo < hi, 1.0, -1.0).astype(dtype)
      Jblk = d.ten_J[tl].T * sign[None, :]
      vec_parts.append(dict(
          J=Jblk, pos=dist, margin=m.tendon_margin[tl].astype(dtype),
          solref=m.tendon_solref_lim[tl].astype(dtype),
          solimp=m.tendon_solimp_lim[tl].astype(dtype),
          iw=m.tendon_invweight0[tl].astype(dtype),
          eq=jnp.zeros(k, dtype=dtype),
          active=(dist < m.tendon_margin[tl]).astype(dtype),
          floss=jnp.zeros(k, dtype=dtype)))

  # ---------------- stack non-contact rows ----------------
  # J parts are stacked/concatenated along the LAST axis -> (nv, nefc)
  parts_J, parts_pos, parts_margin = [], [], []
  parts_solref, parts_solimp, parts_iw = [], [], []
  parts_eq, parts_active = [], []
  parts_floss, parts_mu = [], []
  if rows_J:
    parts_J.append(jnp.stack(rows_J, axis=-1))            # (nv, n)
    parts_pos.append(jnp.stack(
        [jnp.asarray(p, dtype=dtype) for p in rows_pos]))
    parts_margin.append(jnp.stack(rows_margin))
    parts_solref.append(jnp.stack(rows_solref).astype(dtype))
    parts_solimp.append(jnp.stack(rows_solimp).astype(dtype))
    parts_iw.append(jnp.stack(
        [jnp.asarray(w, dtype=dtype) for w in rows_iw]))
    parts_eq.append(jnp.asarray(rows_eq, dtype=dtype))
    parts_active.append(jnp.stack(rows_active))
    parts_floss.append(jnp.stack(rows_floss))
    parts_mu.append(jnp.zeros(len(rows_J), dtype=dtype))
  for vp in vec_parts:
    k = vp['J'].shape[-1]
    parts_J.append(vp['J'])
    parts_pos.append(vp['pos'])
    parts_margin.append(vp['margin'])
    parts_solref.append(vp['solref'])
    parts_solimp.append(vp['solimp'])
    parts_iw.append(vp['iw'])
    parts_eq.append(vp['eq'])
    parts_active.append(vp['active'])
    parts_floss.append(vp['floss'])
    parts_mu.append(jnp.zeros(k, dtype=dtype))

  # ---------------- contacts, vectorized by condim -------------------
  # All slot-level arrays are laid out (nv, slots): the trailing slot
  # axis is big (lane-friendly) and the assembly below concatenates
  # straight into the (nv, nefc) Jacobian without any transposes.
  # Dynamic body lookups go through one-hot matmuls instead of gathers
  # (XLA:TPU lowers batched dynamic gathers at ~20 GB/s; a one-hot
  # matmul of these sizes rides the MXU instead).
  if not (disable & constants.DisableBit.CONTACT) and m.ncon_sel:
    con = d.contact
    ns = m.ncon_sel
    gbody = jnp.asarray(m.geom_bodyid, dtype=jnp.int32)
    b1s = gbody[con.geom1]
    b2s = gbody[con.geom2]
    bids = jnp.arange(m.nbody, dtype=jnp.int32)
    oh1 = (b1s[:, None] == bids).astype(dtype)          # (s, nb)
    oh2 = (b2s[:, None] == bids).astype(dtype)
    root_com = d.subtree_com[np.array(m.body_rootid)]   # (nb, 3) tiny
    com1 = oh1 @ root_com                               # (s, 3)
    com2 = oh2 @ root_com
    off1 = con.pos - com1                               # (s, 3)
    off2 = con.pos - com2
    bdm = jnp.asarray(m.body_dof_mask, dtype=dtype)     # (nb, nv)
    mask1_t = bdm.T @ oh1.T                             # (nv, s)
    mask2_t = bdm.T @ oh2.T
    dm_t = mask2_t - mask1_t
    ang = d.cdof[:, :3]                                 # (nv, 3)
    lin = d.cdof[:, 3:]
    # translational jacobian difference, unrolled over the 3 world axes:
    # jd[j](v,s) = dm*lin[v,j] + (ang x (m2*off2 - m1*off1))_j
    qq = [mask2_t * off2[None, :, b] - mask1_t * off1[None, :, b]
          for b in range(3)]                            # 3 x (nv, s)
    jd = []
    for j in range(3):
      a, b = (j + 1) % 3, (j + 2) % 3
      jd.append(dm_t * lin[:, j:j + 1] +
                ang[:, a:a + 1] * qq[b] - ang[:, b:b + 1] * qq[a])
    frame = con.frame
    # contact-frame rows: jn[i](v,s) = sum_j frame[s,i,j] jd[j](v,s)
    jn = [frame[None, :, i, 0] * jd[0] + frame[None, :, i, 1] * jd[1] +
          frame[None, :, i, 2] * jd[2] for i in range(3)]
    need_rot = any(c >= 4 for c in _contact_condim_groups(m))
    if need_rot:
      jrd = [dm_t * ang[:, j:j + 1] for j in range(3)]
      jr = [frame[None, :, i, 0] * jrd[0] + frame[None, :, i, 1] * jrd[1]
            + frame[None, :, i, 2] * jrd[2] for i in range(3)]
    biw = jnp.asarray(m.body_invweight0, dtype=dtype)
    iw_all = oh1 @ biw[:, 0] + oh2 @ biw[:, 0]          # (s,)

    for c in _contact_condim_groups(m):
      slots = np.array([s for s in range(m.ncon_sel)
                        if m.sel_condim[s] == c], dtype=np.int32)
      k = len(slots)
      sl = slice(None) if k == ns else slots
      dist = con.dist[sl]
      margin = con.includemargin[sl]
      active = con.active[sl].astype(dtype)
      solref = con.solref[sl]
      solimp = con.solimp[sl]
      iw = iw_all[sl]
      if c == 1:
        parts_J.append(jn[0][:, sl])                    # (nv, k)
        parts_pos.append(dist)
        parts_margin.append(margin)
        parts_solref.append(solref)
        parts_solimp.append(solimp)
        parts_iw.append(iw)
        parts_eq.append(jnp.zeros(k, dtype=dtype))
        parts_active.append(active)
        parts_floss.append(jnp.zeros(k, dtype=dtype))
        parts_mu.append(jnp.zeros(k, dtype=dtype))
      elif elliptic:
        # elliptic cone: condim RAW rows per slot (normal + friction
        # axes scaled by mu/mu_i so the cone is circular with
        # coefficient mu = friction[0]; oracle mj_makeConstraint)
        naxes = c - 1
        axes = [jn[1][:, sl], jn[2][:, sl]]
        if c >= 4:
          axes.append(jr[0][:, sl])
          if c >= 6:
            axes.append(jr[1][:, sl])
            axes.append(jr[2][:, sl])
        mu_c = con.friction[sl, 0]                    # (k,)
        fri = con.friction[sl, :naxes]                # (k, naxes)
        scale = mu_c[:, None] / jnp.maximum(fri, 1e-12)
        axes_s = jnp.stack(axes[:naxes], axis=2) * scale[None]
        rows = jnp.concatenate(
            [jn[0][:, sl][:, :, None], axes_s], axis=2)   # (nv, k, c)
        rows = rows.reshape(nv, k * c)
        rep = lambda x: jnp.repeat(x, c, axis=0)
        parts_J.append(rows)
        parts_pos.append(rep(dist))     # depth drives impedance on all
        parts_margin.append(rep(margin))
        parts_solref.append(rep(solref))
        parts_solimp.append(rep(solimp))
        parts_iw.append(rep(iw))
        parts_eq.append(jnp.zeros(k * c, dtype=dtype))
        parts_active.append(rep(active))
        parts_floss.append(jnp.zeros(k * c, dtype=dtype))
        parts_mu.append(rep(mu_c))
      else:
        naxes = c - 1
        axes = [jn[1][:, sl], jn[2][:, sl]]
        if c >= 4:
          axes.append(jr[0][:, sl])
          if c >= 6:
            axes.append(jr[1][:, sl])
            axes.append(jr[2][:, sl])
        axes = jnp.stack(axes[:naxes], axis=2)        # (nv, k, naxes)
        mu = con.friction[sl, :naxes]                 # (k, naxes)
        normal = jn[0][:, sl][:, :, None]             # (nv, k, 1)
        plus = normal + mu[None] * axes
        minus = normal - mu[None] * axes
        rows = jnp.stack([plus, minus], axis=3)       # (nv, k, naxes, 2)
        rows = rows.reshape(nv, k * naxes * 2)
        rep = lambda x: jnp.repeat(x, naxes * 2, axis=0)
        parts_J.append(rows)
        parts_pos.append(rep(dist))
        parts_margin.append(rep(margin))
        parts_solref.append(rep(solref))
        parts_solimp.append(rep(solimp))
        # oracle-calibrated pyramidal regularizer weight:
        # diagApprox = 2 mu^2 (1 + mu^2) * (iw1 + iw2)
        iw_pyr = (iw[:, None] * 2.0 * mu * mu * (1.0 + mu * mu))
        parts_iw.append(
            jnp.repeat(iw_pyr.reshape(-1), 2, axis=0))
        parts_eq.append(jnp.zeros(k * naxes * 2, dtype=dtype))
        parts_active.append(rep(active))
        parts_floss.append(jnp.zeros(k * naxes * 2, dtype=dtype))
        parts_mu.append(jnp.zeros(k * naxes * 2, dtype=dtype))

  if not parts_J:
    z = jnp.zeros((0,), dtype=dtype)
    return _Rows(jnp.zeros((nv, 0), dtype=dtype), z, z,
                 jnp.zeros((0, 2), dtype=dtype),
                 jnp.zeros((0, 5), dtype=dtype), z, z, z, z, z)

  cat = (lambda xs: xs[0] if len(xs) == 1 else jnp.concatenate(xs))
  catj = (lambda xs: xs[0] if len(xs) == 1
          else jnp.concatenate(xs, axis=-1))
  return _Rows(
      J=catj(parts_J),
      pos=cat(parts_pos),
      margin=cat(parts_margin),
      solref=cat(parts_solref),
      solimp=cat(parts_solimp),
      invweight=cat(parts_iw),
      eq_mask=cat(parts_eq),
      slot_active=cat(parts_active),
      frictionloss=cat(parts_floss),
      mu=cat(parts_mu),
  )


def _contact_condim_groups(m: Model):
  return sorted(set(m.sel_condim))


def _dof_has_frictionloss(m: Model, v: int) -> bool:
  return bool(m.dof_hasfrictionloss[v])


def fwd_constraint(m: Model, d: Data) -> Data:
  """Solve for constrained qacc via primal Newton iterations."""
  if (m.opt.disableflags & constants.DisableBit.CONSTRAINT):
    return d.replace(
        qacc=d.qacc_smooth,
        qfrc_constraint=jnp.zeros_like(d.qacc_smooth),
        efc_force=jnp.zeros(m.nefc_max, dtype=d.qpos.dtype),
        qacc_warmstart=d.qacc_smooth)

  rows = make_rows(m, d)
  nefc = rows.J.shape[-1]
  dtype = d.qpos.dtype
  if nefc == 0:
    return d.replace(
        qacc=d.qacc_smooth,
        qfrc_constraint=jnp.zeros_like(d.qacc_smooth),
        efc_force=jnp.zeros(m.nefc_max, dtype=dtype),
        qacc_warmstart=d.qacc_smooth)

  # impedance, reference acceleration, regularizer
  pmm = rows.pos - rows.margin
  imp = _impedance(rows.solimp, pmm)
  vel = d.qvel @ rows.J
  spring = jnp.asarray(_elliptic_spring_scale(m, nefc), dtype)
  aref = _kbip(m, rows.solref, rows.solimp, imp, pmm * spring, vel)
  r = jnp.maximum((1.0 - imp) / imp * rows.invweight, 1e-12)
  dweight = jnp.where(rows.slot_active > 0, 1.0 / r, 0.0)

  M = d.qM
  a0 = d.qacc_smooth
  J = rows.J
  eq = rows.eq_mask == 1.0
  fric = rows.eq_mask == 2.0
  floss = rows.frictionloss
  groups = _elliptic_groups(m)
  cone_args = (dweight, eq, fric, floss, rows.mu, groups)

  def row_force(jar):
    return _row_force_cone(jar, *cone_args)

  # start from warmstart if it is finite and better than smooth
  def cost_of(x):
    jar = x @ J - aref
    dv = x - a0
    return 0.5 * dv @ (M @ dv) + jnp.sum(
        _cost_rows_cone(jar, *cone_args))

  ws = jnp.where(jnp.all(jnp.isfinite(d.qacc_warmstart)),
                 d.qacc_warmstart, a0)
  x = jnp.where(cost_of(ws) < cost_of(a0), ws, a0)

  tol = m.opt.tolerance.astype(dtype)
  # scale for the improvement test (mirrors the oracle's
  # tolerance * meaninertia * max(1, nv) scaling in spirit)
  scale = jnp.maximum(jnp.trace(M) / max(m.nv, 1), 1e-12)
  ls_iters = min(m.opt.ls_iterations, 8)

  def newton_iter(x):
    jar = x @ J - aref
    w, Jh = _hess_cone(jar, J, *cone_args)
    grad = M @ (x - a0) - J @ row_force(jar)
    H = M + jnp.einsum('ve,e,we->vw', Jh, w, Jh)
    p = -linalg.solve_psd(H, grad)
    # exact line search on the piecewise quadratic phi(alpha)
    jp = p @ J
    pMp = p @ (M @ p)
    pM_dx = p @ (M @ (x - a0))

    # Safeguarded Newton on phi'(alpha): in a kinetic/inactive zone
    # phi'' carries no constraint curvature, so a raw Newton step can
    # jump across the kink and cycle between zones forever (measured on
    # frictionloss rows). Keep a sign bracket and bisect whenever the
    # Newton proposal leaves it.
    def ls_body(carry, _):
      alpha, lo, hi = carry
      ra = jar + alpha * jp
      drows, ddrows = _ls_rows_cone(ra, jp, *cone_args)
      dphi = pM_dx + alpha * pMp - jnp.sum(drows)
      ddphi = pMp + jnp.sum(ddrows)
      lo = jnp.where(dphi < 0, jnp.maximum(lo, alpha), lo)
      hi = jnp.where(dphi > 0, jnp.minimum(hi, alpha), hi)
      newton = alpha - dphi / jnp.maximum(ddphi, 1e-12)
      inside = (newton > lo) & (newton < hi)
      alpha = jnp.where(inside, newton, 0.5 * (lo + hi))
      return (alpha, lo, hi), None

    (alpha, _, _), _ = jax.lax.scan(
        ls_body,
        (jnp.ones((), dtype=dtype), jnp.zeros((), dtype=dtype),
         jnp.asarray(4.0, dtype=dtype)),
        None, length=ls_iters, unroll=ls_iters)
    alpha = jnp.clip(alpha, 0.0, 4.0)
    return x + alpha * p

  # dtype-aware convergence floor — see fwd_constraint_batched
  eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)

  def cond_fn(carry):
    x, cost, it, done = carry
    return (~done) & (it < m.opt.solver_iterations)

  def body_fn(carry):
    x, cost, it, _ = carry
    x_new = newton_iter(x)
    cost_new = cost_of(x_new)
    improved = cost_new < cost
    x = jnp.where(improved, x_new, x)
    # converged when the improvement is negligible (or no improvement).
    # NaN costs (diverged envs) must also exit: under vmap the batch
    # runs until EVERY lane is done, so one NaN env would otherwise
    # force max iterations for the whole batch.
    thresh = jnp.maximum(tol * scale, 8 * eps * jnp.abs(cost))
    done = ~((cost - cost_new) >= thresh) | ~jnp.isfinite(cost_new)
    cost = jnp.minimum(cost, cost_new)
    return (x, cost, it + 1, done)

  x, _, niter, _ = jax.lax.while_loop(
      cond_fn, body_fn,
      (x, cost_of(x), jnp.zeros((), jnp.int32),
       jnp.zeros((), dtype=bool)))

  jar = x @ J - aref
  force = row_force(jar)
  qfrc_constraint = J @ force

  efc_force = jnp.zeros(m.nefc_max, dtype=dtype)
  efc_force = efc_force.at[:nefc].set(force)

  # per-contact forces in contact frame (normal, t1, t2) for sensors
  confrc = _contact_forces(m, d, force, dtype)

  return d.replace(
      qacc=x, qfrc_constraint=qfrc_constraint, efc_force=efc_force,
      qacc_warmstart=x, solver_niter=niter,
      contact=d.contact.replace(force=confrc))


def fwd_constraint_batched(m: Model, D: Data,
                           compute_forces: bool = True) -> Data:
  """Batched constraint solve over a leading env axis.

  Same math as fwd_constraint, but the Newton loop is written with an
  explicit batch dimension so the SPD direction solve can run as ONE
  Pallas kernel per iteration (batch on the lane axis) instead of the
  unrolled per-env formulation — see ops/pallas_kernels.py. Row
  assembly and the trailing bookkeeping stay vmapped (elementwise).
  """
  from dm_control_tpu.ops import pallas_kernels

  dtype = D.qpos.dtype
  if (m.opt.disableflags & constants.DisableBit.CONSTRAINT):
    return jax.vmap(lambda d: fwd_constraint(m, d))(D)

  rows = jax.vmap(lambda d: make_rows(m, d))(D)
  nefc = rows.J.shape[-1]
  if nefc == 0:
    return jax.vmap(lambda d: fwd_constraint(m, d))(D)

  # Pad the dof axis at the source: every downstream J consumer works
  # on the 8-aligned system (the Pallas direction solve needs it, and
  # padding HERE lets XLA fuse the pad into the J-materializing fusion
  # instead of writing the Jacobian twice).
  nvp_early = max(8, -(-m.nv // 8) * 8)
  if nvp_early != m.nv:
    J = jnp.pad(rows.J, ((0, 0), (0, nvp_early - m.nv), (0, 0)))
    qvel_p = jnp.pad(D.qvel, ((0, 0), (0, nvp_early - m.nv)))
  else:
    J = rows.J
    qvel_p = D.qvel

  pmm = rows.pos - rows.margin
  imp = _impedance(rows.solimp, pmm)
  vel = jnp.einsum('bv,bve->be', qvel_p, J)
  spring = jnp.asarray(_elliptic_spring_scale(m, nefc), dtype)
  aref = _kbip(m, rows.solref, rows.solimp, imp, pmm * spring, vel)
  r = jnp.maximum((1.0 - imp) / imp * rows.invweight, 1e-12)
  dweight = jnp.where(rows.slot_active > 0, 1.0 / r, 0.0)

  M = D.qM                     # (B, nv, nv)
  a0 = D.qacc_smooth           # (B, nv)
  eq = rows.eq_mask == 1.0
  fric = rows.eq_mask == 2.0
  floss = rows.frictionloss
  mu_rows = rows.mu
  groups = _elliptic_groups(m)

  # ---- runtime row compaction -------------------------------------
  # nefc here is the compile-time worst case, but a row only matters
  # when dweight > 0 (violated limit / penetrating contact), which is
  # fixed for the whole solve (position-dependent only) and empirically
  # tiny: humanoid.run pads 225 rows, of which p99 = 5 are live. The C
  # engine assembles exactly the live rows (dynamic nefc); the TPU
  # equivalent is a per-env top-K over dweight, gathered through a
  # one-hot matmul (one MXU pass over J) so every Newton iteration
  # runs K-wide instead of nefc-wide. Lossless unless more than K rows
  # are simultaneously live (then the lowest-impedance rows drop —
  # the same soft contract as the compile-time contact budget).
  nefc_full, J_full = nefc, J
  _ROW_BUDGET = 64
  # Row compaction pays a one-hot gather of J per solve (~0.3 ms at
  # humanoid sizes) — measured on humanoid.run (nefc 101 -> K 64) the
  # gather costs MORE than the narrower iterations save, so the gate
  # stays at ~2.5x the budget where the trade flips. Elliptic contact
  # blocks must stay intact, so it is pyramidal-only.
  compact = nefc > 160 and not groups
  if compact:
    K = _ROW_BUDGET
    # equality / frictionloss rows are unconditionally live — bias the
    # key so they can never be evicted by a pile-up of contacts
    key = dweight + jnp.where(eq | fric, jnp.asarray(1e30, dtype), 0)
    _, sel = jax.lax.top_k(key, K)                     # (B, K)
    onehot = (sel[..., None] ==
              jnp.arange(nefc)[None, None, :]).astype(dtype)
    J = jnp.einsum('bve,bke->bvk', J_full, onehot)
    aref = jnp.einsum('bke,be->bk', onehot, aref)
    dweight = jnp.einsum('bke,be->bk', onehot, dweight)
    floss = jnp.einsum('bke,be->bk', onehot, floss)
    eq = jnp.einsum('bke,be->bk', onehot, eq.astype(dtype)) > 0.5
    fric = jnp.einsum('bke,be->bk', onehot, fric.astype(dtype)) > 0.5
    nefc = K

  tol = m.opt.tolerance.astype(dtype)
  ls_iters = min(m.opt.ls_iterations, 8)
  # Convergence threshold: the model tolerance, floored at the dtype's
  # noise level — in f32 an improvement below ~8 eps |cost| is rounding
  # noise, and iterating through it would run every batch to the
  # iteration cap (the while_loop runs until EVERY env converges).
  eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)

  # DOF padding: the Pallas direction solve works on 8-aligned systems;
  # zero-padding J / identity-padding M ONCE here (extra dofs stay
  # exactly zero through every matvec) removes the per-iteration
  # pad/unpad dynamic-update-slices inside the solve.
  nvp = max(8, -(-m.nv // 8) * 8)

  def _pad_nv(M, a0):
    if nvp == m.nv:
      return M, a0
    k = nvp - m.nv
    eye_tail = np.zeros((nvp, nvp), dtype=np.float64)
    eye_tail[np.arange(m.nv, nvp), np.arange(m.nv, nvp)] = 1.0
    Mp = jnp.pad(M, ((0, 0), (0, k), (0, k))) + jnp.asarray(
        eye_tail, dtype)
    a0p = jnp.pad(a0, ((0, 0), (0, k)))
    return Mp, a0p

  def make_solver(J, M, a0, aref, dweight, eq, fric, floss, mu_rows):
    """Closure bundle (jmul/cost/newton/loop) over one batch slice —
    built twice: once for the full batch, once for the straggler tail
    after compaction. J/M/a0 arrive nv-padded (see _pad_nv)."""
    cone_args = (dweight, eq, fric, floss, mu_rows, groups)

    def row_force(jar):
      return _row_force_cone(jar, *cone_args)

    def jmul(x):                 # (B, nvp) -> (B, nefc)
      return jnp.einsum('bv,bve->be', x, J)

    def jtmul(f):                # (B, nefc) -> (B, nvp)
      return jnp.einsum('bve,be->bv', J, f)

    def mmul(x):                 # (B, nvp) -> (B, nvp)
      return jnp.einsum('bij,bj->bi', M, x)

    def cost_of(x):
      jar = jmul(x) - aref
      dv = x - a0
      return 0.5 * jnp.einsum('bi,bi->b', dv, mmul(dv)) + jnp.sum(
          _cost_rows_cone(jar, *cone_args), axis=-1)

    scale = jnp.maximum(
        jnp.trace(M, axis1=-2, axis2=-1) / max(m.nv, 1), 1e-12)

    # Gauss-Newton direction in reduced precision: the Hessian and the
    # gradient's J-transpose pass only steer the SEARCH DIRECTION —
    # correctness is guarded by the f32 exact line search on the f32
    # jar and the monotone-cost acceptance test — so the iteration's
    # biggest HBM streams run with bf16 operands and f32 accumulation
    # on the MXU. jar itself is updated with the f32 J (jmul(p) stays
    # full precision) so costs/forces never see bf16 rounding.
    # Disabled under x64 (parity/oracle runs).
    use_bf16 = dtype == jnp.float32
    # With no elliptic groups the cone transform leaves rows unchanged
    # (Jh == J), so the bf16 copy of J hoists out of the loop entirely.
    Jb = J.astype(jnp.bfloat16) if (use_bf16 and not groups) else None

    def hess_assemble(Jh, w):
      if Jb is not None:
        wJh = Jb * w[..., None, :].astype(jnp.bfloat16)
        return M + jnp.einsum(
            'bve,bwe->bvw', wJh, Jb,
            preferred_element_type=jnp.float32)
      if use_bf16:
        wJh = (Jh * w[..., None, :]).astype(jnp.bfloat16)
        return M + jnp.einsum(
            'bve,bwe->bvw', wJh, Jh.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
      return M + jnp.einsum('bve,be,bwe->bvw', Jh, w, Jh)

    def jtmul_dir(f):
      """J^T f for the gradient (direction-only precision)."""
      if Jb is not None:
        return jnp.einsum('bve,be->bv', Jb, f.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
      return jtmul(f)

    def newton_iter(x, jar, cost, done):
      """One safeguarded Newton step from (x, jar=J'x - aref).

      jar is updated incrementally (jar_new = jar + alpha*jp) — saves
      two full J streams per iteration vs recomputing jmul(x_new) —
      and M(x-a0)/M p are computed once and reused across the
      gradient, the line-search coefficients, and the cost update."""
      if Jb is not None:
        w_base = jnp.where(eq | (jar < 0), dweight, 0.0)
        w_fr = jnp.where(jnp.abs(dweight * jar) < floss, dweight, 0.0)
        w = jnp.where(fric, w_fr, w_base)
        Jh = None
      else:
        w, Jh = _hess_cone(jar, J, *cone_args)
      m_dx = mmul(x - a0)
      grad = m_dx - jtmul_dir(row_force(jar))
      H = hess_assemble(Jh, w)
      p = -pallas_kernels.chol_solve_batched(H, grad)
      jp = jmul(p)
      m_p = mmul(p)
      pMp = jnp.einsum('bi,bi->b', p, m_p)
      pM_dx = jnp.einsum('bi,bi->b', p, m_dx)

      # safeguarded Newton on phi' (bracket + bisection fallback) — see
      # the per-env solver for why a raw Newton step can cycle
      def ls_body(carry, _):
        alpha, lo, hi = carry
        ra = jar + alpha[:, None] * jp
        drows, ddrows = _ls_rows_cone(ra, jp, *cone_args)
        dphi = pM_dx + alpha * pMp - jnp.sum(drows, axis=-1)
        ddphi = pMp + jnp.sum(ddrows, axis=-1)
        lo = jnp.where(dphi < 0, jnp.maximum(lo, alpha), lo)
        hi = jnp.where(dphi > 0, jnp.minimum(hi, alpha), hi)
        newton = alpha - dphi / jnp.maximum(ddphi, 1e-12)
        inside = (newton > lo) & (newton < hi)
        alpha = jnp.where(inside, newton, 0.5 * (lo + hi))
        return (alpha, lo, hi), None

      Bn = x.shape[0]
      (alpha, _, _), _ = jax.lax.scan(
          ls_body,
          (jnp.ones(Bn, dtype=dtype), jnp.zeros(Bn, dtype=dtype),
           jnp.full(Bn, 4.0, dtype=dtype)),
          None, length=ls_iters, unroll=ls_iters)
      alpha = jnp.clip(alpha, 0.0, 4.0)
      x_new = x + alpha[:, None] * p
      jar_new = jar + alpha[:, None] * jp
      # cost at the new point, reusing m_dx/m_p:
      # M(x_new - a0) = M(x - a0) + alpha M p
      m_dvn = m_dx + alpha[:, None] * m_p
      cost_new = 0.5 * jnp.einsum(
          'bi,bi->b', x_new - a0, m_dvn) + jnp.sum(
              _cost_rows_cone(jar_new, *cone_args), axis=-1)

      improved = (cost_new < cost) & ~done
      x = jnp.where(improved[:, None], x_new, x)
      jar = jnp.where(improved[:, None], jar_new, jar)
      thresh = jnp.maximum(tol * scale, 8 * eps * jnp.abs(cost))
      done = done | ~((cost - cost_new) >= thresh) | ~jnp.isfinite(
          cost_new)
      cost = jnp.where(improved, cost_new, cost)
      return x, jar, cost, done

    def loop(x, jar, cost, done, it0, max_iters, tail_thresh):
      """Monotone Newton iterations until only `tail_thresh` envs
      remain unconverged or `max_iters` total iterations."""

      def cond_fn(carry):
        x, jar, cost, it, done = carry
        return (jnp.sum(~done) > tail_thresh) & (it < max_iters)

      def body_fn(carry):
        x, jar, cost, it, done = carry
        x, jar, cost, done = newton_iter(x, jar, cost, done)
        return (x, jar, cost, it + 1, done)

      return jax.lax.while_loop(cond_fn, body_fn,
                                (x, jar, cost, it0, done))

    def fixed_loop(x, jar, cost, done, n_iters):
      """Exactly n_iters masked Newton passes (no convergence sync).

      Used for the full-batch phase where the unconverged count stays
      above the cutoff anyway: dropping the while-cond removes a
      cross-batch reduction + scalar sync per iteration and lets XLA
      pipeline the iterations back to back."""
      def body(carry, _):
        x, jar, cost, done = carry
        x, jar, cost, done = newton_iter(x, jar, cost, done)
        return (x, jar, cost, done), ()
      (x, jar, cost, done), _ = jax.lax.scan(
          body, (x, jar, cost, done), None, length=n_iters)
      return x, jar, cost, done

    return jmul, cost_of, row_force, jtmul, loop, fixed_loop

  Jp = J   # already dof-padded at the source (above)
  Mp, a0p = _pad_nv(M, a0)
  (jmul, cost_of, row_force, jtmul, full_loop,
   fixed_loop) = make_solver(
      Jp, Mp, a0p, aref, dweight, eq, fric, floss, mu_rows)

  ws = jnp.where(jnp.all(jnp.isfinite(D.qacc_warmstart), axis=-1,
                         keepdims=True), D.qacc_warmstart, a0)
  if nvp != m.nv:
    ws = jnp.zeros_like(a0p).at[:, :m.nv].set(ws)
  a0 = a0p
  # Evaluate both start candidates (warmstart vs qacc_smooth) with ONE
  # stacked J pass; keep the winner's jar/cost so the loop needs no
  # fresh jmul/cost evaluation.
  cone_args0 = (dweight, eq, fric, floss, mu_rows, groups)
  jar2 = jnp.einsum('bsv,bve->bse', jnp.stack([ws, a0], axis=1),
                    Jp) - aref[:, None, :]
  jar_ws, jar_a0 = jar2[:, 0], jar2[:, 1]
  dv_ws = ws - a0
  cost_ws = 0.5 * jnp.einsum(
      'bi,bi->b', dv_ws, jnp.einsum('bij,bj->bi', Mp, dv_ws)) + jnp.sum(
          _cost_rows_cone(jar_ws, *cone_args0), axis=-1)
  cost_a0 = jnp.sum(_cost_rows_cone(jar_a0, *cone_args0), axis=-1)
  use_ws = cost_ws < cost_a0
  x = jnp.where(use_ws[:, None], ws, a0)
  jar0 = jnp.where(use_ws[:, None], jar_ws, jar_a0)
  cost0 = jnp.where(use_ws, cost_ws, cost_a0)

  # Straggler cutoff + tail compaction: the batch steps in lockstep,
  # so the slowest env sets the iteration count for all. Measured on
  # humanoid.run, >97% of envs converge within 3-4 Newton iterations,
  # but a long tail (falling/impact states) otherwise drags the whole
  # batch through up to solver_iterations full-width passes. Phase 1
  # runs a few full-batch iterations; phase 2 GATHERS the unconverged
  # tail (<= B/16 envs) and iterates only it at 1/16 the cost, then
  # scatters the refined solutions back. Envs beyond the tail budget
  # keep their best-so-far qacc — the same soft contract as hitting
  # opt.solver_iterations in the C engine. Batches under 1024 envs
  # skip compaction and run the plain loop to full convergence.
  B = x.shape[0]
  cap = m.opt.solver_iterations
  done0 = jnp.zeros(B, dtype=bool)
  it0 = jnp.zeros((), jnp.int32)
  if B >= 1024:
    _FULL_PASSES = 3
    tail = B // 16
    n_full = min(_FULL_PASSES, int(cap))
    x, jarx, cost, niter, done = full_loop(
        x, jar0, cost0, done0, it0, jnp.asarray(n_full, jnp.int32),
        B // 256)
    # gather the unconverged tail and iterate only it
    sel = jax.lax.top_k((~done).astype(jnp.float32), tail)[1]  # (tail,)

    def take(a):
      return jnp.take(a, sel, axis=0)

    _, _, _, _, tail_loop, _ = make_solver(
        take(Jp), take(Mp), take(a0), take(aref), take(dweight),
        take(eq), take(fric), take(floss), take(mu_rows))
    xt, jart, ct, niter, _ = tail_loop(take(x), take(jarx), take(cost),
                                       take(done), niter, cap, 0)
    # scatter refined tail solutions back (only where cost improved)
    better = ct < take(cost)
    x = x.at[sel].set(jnp.where(better[:, None], xt, take(x)))
    jar = jarx.at[sel].set(jnp.where(better[:, None], jart, take(jarx)))
  else:
    x, jar, _, niter, _ = full_loop(x, jar0, cost0, done0, it0,
                                    cap, B // 256)

  # jar was tracked incrementally through every accepted step (exactly
  # alongside x), so no final J pass is needed to recover the forces
  force = row_force(jar)
  qfrc_constraint = jtmul(force)[:, :m.nv]
  x = x[:, :m.nv]
  D = D.replace(
      qacc=x, qfrc_constraint=qfrc_constraint, qacc_warmstart=x,
      solver_niter=jnp.broadcast_to(niter, (B,)))
  if not compute_forces:
    # rollout fast path: efc_force / per-contact forces are only read
    # by sensors and the engine API, which the slim scan never touches
    return D

  if compact:
    # scatter the compacted forces back to the full row layout
    force = jnp.einsum('bke,bk->be', onehot, force)
  efc_force = jnp.zeros((B, m.nefc_max), dtype=dtype)
  efc_force = efc_force.at[:, :nefc_full].set(force)

  def _finish(d, f):
    confrc = _contact_forces(m, d, f, dtype)
    return d.contact.replace(force=confrc)
  contact = jax.vmap(_finish)(D, force)

  return D.replace(efc_force=efc_force, contact=contact)


def _contact_forces(m: Model, d: Data, force: jax.Array, dtype):
  """Recover per-slot contact-frame forces from pyramid row forces.

  Row layout matches make_rows: non-contact rows, then contact groups
  by ascending condim, slot-ascending within each group.
  """
  confrc = jnp.zeros((m.ncon_sel, 3), dtype=dtype)
  if m.ncon_sel == 0 or (m.opt.disableflags & constants.DisableBit.CONTACT):
    return confrc
  idx = _num_noncontact_rows(m)
  for c in _contact_condim_groups(m):
    slots = np.array([s for s in range(m.ncon_sel)
                      if m.sel_condim[s] == c], dtype=np.int32)
    k = len(slots)
    if c == 1:
      fn = force[idx:idx + k]
      confrc = confrc.at[slots, 0].set(fn)
      idx += k
    elif int(m.opt.cone) == int(constants.ConeType.ELLIPTIC):
      grp = force[idx:idx + k * c].reshape(k, c)
      # friction rows were assembled in mu-circularized coordinates
      # (J_i scaled by mu/mu_i); forces on the raw axes scale the same
      mu = d.contact.friction[slots, 0]
      fri = d.contact.friction[slots, :c - 1]
      scale = mu[:, None] / jnp.maximum(fri, 1e-12)
      ft = grp[:, 1:] * scale
      confrc = confrc.at[slots, 0].set(grp[:, 0])
      confrc = confrc.at[slots, 1].set(ft[:, 0])
      if c >= 3:
        confrc = confrc.at[slots, 2].set(ft[:, 1])
      idx += k * c
    else:
      naxes = c - 1
      grp = force[idx:idx + k * naxes * 2].reshape(k, naxes, 2)
      fn = jnp.sum(grp, axis=(1, 2))
      mu = d.contact.friction[slots, :naxes]
      ft = mu * (grp[:, :, 0] - grp[:, :, 1])     # (k, naxes)
      confrc = confrc.at[slots, 0].set(fn)
      confrc = confrc.at[slots, 1].set(ft[:, 0])
      if naxes >= 2:
        confrc = confrc.at[slots, 2].set(ft[:, 1])
      idx += k * naxes * 2
  return confrc


def _num_noncontact_rows(m: Model) -> int:
  n = 0
  if not (m.opt.disableflags & constants.DisableBit.EQUALITY):
    for e in range(m.neq):
      n += {int(constants.EqType.CONNECT): 3,
            int(constants.EqType.WELD): 6,
            int(constants.EqType.JOINT): 1,
            int(constants.EqType.TENDON): 1}[m.eq_type[e]]
  if not (m.opt.disableflags & constants.DisableBit.FRICTIONLOSS):
    n += sum(1 for v in range(m.nv) if _dof_has_frictionloss(m, v))
  if not (m.opt.disableflags & constants.DisableBit.LIMIT):
    n += sum(1 for j in range(m.njnt) if m.jnt_limited[j])
    n += sum(1 for t in range(m.ntendon) if m.tendon_limited[t])
  return n
