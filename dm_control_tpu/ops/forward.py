"""Forward dynamics pipeline and integrators.

`forward(m, d)` mirrors the semantic stages of the reference engine step
(reference: dm_control/mujoco/engine.py:147-176, 335-343 — position,
velocity, actuation, acceleration, constraint), re-expressed as a pure
function pipeline on the Data pytree. `step(m, d)` = forward + integrate
(semi-implicit Euler with implicit joint damping, or RK4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.models import constants
from dm_control_tpu.models.types import Data, Model
from dm_control_tpu.ops import collision as coll
from dm_control_tpu.ops import constraint
from dm_control_tpu.ops import linalg
from dm_control_tpu.ops import math as mops
from dm_control_tpu.ops import sensor as sensor_ops
from dm_control_tpu.ops import smooth

_J = constants.JointType


# ---------------------------------------------------------------------------
# pipeline stages
# ---------------------------------------------------------------------------


def fwd_position(m: Model, d: Data, factor: bool = True) -> Data:
  d = smooth.kinematics(m, d)
  d = smooth.com_pos(m, d)
  d = smooth.tendon(m, d)
  d = smooth.crb(m, d)
  if factor:
    # the explicit inverse factor qLD feeds the per-env solve_m; the
    # batched path solves through the Pallas kernel instead and skips it
    d = smooth.factor_m(m, d)
  if not (m.opt.disableflags & (constants.DisableBit.CONTACT |
                                constants.DisableBit.CONSTRAINT)):
    d = coll.collision(m, d)
  d = smooth.transmission(m, d)
  return d


def fwd_velocity(m: Model, d: Data) -> Data:
  d = smooth.com_vel(m, d)
  d = smooth.tendon_vel(m, d)
  if m.nu:
    d = d.replace(actuator_velocity=d.actuator_moment @ d.qvel)
  d = smooth.rne(m, d)
  d = smooth.passive(m, d)
  return d


def fwd_actuation(m: Model, d: Data) -> Data:
  dtype = d.qpos.dtype
  if not m.nu or (m.opt.disableflags & constants.DisableBit.ACTUATION):
    return d.replace(
        qfrc_actuator=jnp.zeros(m.nv, dtype=dtype),
        actuator_force=jnp.zeros(m.nu, dtype=dtype),
        act_dot=jnp.zeros(m.na, dtype=dtype))

  ctrl = d.ctrl
  if not (m.opt.disableflags & constants.DisableBit.CLAMPCTRL):
    limited = jnp.array(m.actuator_ctrllimited, dtype=bool)
    clamped = jnp.clip(ctrl, m.actuator_ctrlrange[:, 0],
                       m.actuator_ctrlrange[:, 1])
    ctrl = jnp.where(limited, clamped, ctrl)

  # activation dynamics, vectorized over actuators: stateless (NONE)
  # actuators pass ctrl straight through; stateful ones read their act
  # slot. Per-actuator Python loops blow up trace size on big models
  # (humanoid_CMU: 56 actuators).
  act_dot = jnp.zeros(m.na, dtype=dtype)
  dyntypes = np.array(m.actuator_dyntype)
  if m.na == 0 and np.all(dyntypes == int(constants.DynType.NONE)):
    input_vec = ctrl
  else:
    stateful = np.where(dyntypes != int(constants.DynType.NONE))[0]
    adrs = np.array(m.actuator_actadr)[stateful]
    a_vals = d.act[adrs]
    u_ctrl = ctrl[stateful]
    is_int = jnp.asarray(
        dyntypes[stateful] == int(constants.DynType.INTEGRATOR))
    tau = jnp.maximum(
        jnp.asarray(m.actuator_dynprm)[stateful, 0], 1e-8)
    ad = jnp.where(is_int, u_ctrl, (u_ctrl - a_vals) / tau)
    act_dot = act_dot.at[adrs].set(ad)
    input_vec = ctrl.at[stateful].set(a_vals)

  # gain / bias
  length = d.actuator_length
  velocity = d.actuator_velocity
  gaintype = jnp.array(m.actuator_gaintype)
  gain = jnp.where(
      gaintype == constants.GainType.FIXED,
      m.actuator_gainprm[:, 0],
      m.actuator_gainprm[:, 0] + m.actuator_gainprm[:, 1] * length +
      m.actuator_gainprm[:, 2] * velocity)
  biastype = jnp.array(m.actuator_biastype)
  bias = jnp.where(
      biastype == constants.BiasType.NONE,
      jnp.zeros(m.nu, dtype=dtype),
      m.actuator_biasprm[:, 0] + m.actuator_biasprm[:, 1] * length +
      m.actuator_biasprm[:, 2] * velocity)
  force = gain * input_vec + bias

  flimited = jnp.array(m.actuator_forcelimited, dtype=bool)
  fclamped = jnp.clip(force, m.actuator_forcerange[:, 0],
                      m.actuator_forcerange[:, 1])
  force = jnp.where(flimited, fclamped, force)

  qfrc = d.actuator_moment.T @ force
  return d.replace(actuator_force=force, qfrc_actuator=qfrc,
                   act_dot=act_dot)


def _qfrc_smooth_total(m: Model, d: Data) -> jax.Array:
  dtype = d.qpos.dtype
  qfrc_applied_total = d.qfrc_applied
  # map world-frame body wrenches [force(3), torque(3)] at xipos to dofs
  if m.nbody > 1:
    frc = d.xfrc_applied[:, :3]
    trq = d.xfrc_applied[:, 3:]
    rootid = jnp.array(m.body_rootid, dtype=jnp.int32)
    offset = d.xipos - d.subtree_com[rootid]
    fs = jnp.concatenate([trq + jnp.cross(offset, frc), frc], axis=-1)
    ftot = m.subtree_mask @ fs
    dofbody = jnp.array(m.dof_bodyid, dtype=jnp.int32)
    qfrc_applied_total = qfrc_applied_total + jnp.einsum(
        'vi,vi->v', d.cdof, ftot[dofbody])

  return (d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator +
          qfrc_applied_total)


def fwd_acceleration(m: Model, d: Data) -> Data:
  qfrc_smooth = _qfrc_smooth_total(m, d)
  qacc_smooth = smooth.solve_m(m, d, qfrc_smooth)
  return d.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)


def fwd_acceleration_batched(m: Model, D: Data) -> Data:
  """Batched smooth-acceleration: ONE Pallas SPD solve over the batch
  instead of the per-env unrolled factor-and-invert (which the batched
  pipeline otherwise vmaps into hundreds of small fusions)."""
  from dm_control_tpu.ops import pallas_kernels
  qfrc = jax.vmap(lambda d: _qfrc_smooth_total(m, d))(D)
  qacc = pallas_kernels.chol_solve_batched(D.qM, qfrc)
  return D.replace(qfrc_smooth=qfrc, qacc_smooth=qacc)


def forward_core(m: Model, d: Data) -> Data:
  d = fwd_position(m, d)
  d = fwd_velocity(m, d)
  d = fwd_actuation(m, d)
  d = fwd_acceleration(m, d)
  d = constraint.fwd_constraint(m, d)
  return d


def fwd_pv(m: Model, d: Data, compute_sensors: bool = True,
           factor: bool = True) -> Data:
  """Position + velocity stages with their sensors (mj_step1 analog)."""
  d = fwd_position(m, d, factor=factor)
  d = fwd_velocity(m, d)
  if compute_sensors:
    d = sensor_ops.sensors(m, d, stages='pv')
  if m.opt.enableflags & constants.EnableBit.ENERGY:
    d = energy(m, d)
  d = _check_health(m, d)
  return d


def fwd_aa(m: Model, d: Data) -> Data:
  """Actuation + acceleration + constraint stages with acc sensors."""
  d = fwd_actuation(m, d)
  d = fwd_acceleration(m, d)
  d = constraint.fwd_constraint(m, d)
  d = sensor_ops.sensors(m, d, stages='acc')
  return d


def forward(m: Model, d: Data) -> Data:
  """Full forward dynamics incl. sensors and energy."""
  d = fwd_pv(m, d)
  d = fwd_aa(m, d)
  return d


def step_legacy(m: Model, d: Data) -> Data:
  """One step that PRESERVES the fresh-derived-state invariant.

  Requires d to be position/velocity-fresh (as produced by forward()
  or a previous step_legacy). Semantics match the reference's
  legacy_step split (reference dm_control/mujoco/engine.py:147-162):
  solve accelerations with the current ctrl, integrate, then refresh
  position/velocity stages — so observations read a consistent state
  without a second full pipeline per control step.
  """
  d = fwd_aa(m, d)
  d = _integrate(m, d)
  return fwd_pv(m, d)


def energy(m: Model, d: Data) -> Data:
  dtype = d.qpos.dtype
  gravity = m.opt.gravity.astype(dtype)
  pot = -jnp.sum(m.body_mass * (d.xipos @ gravity))
  # joint springs
  for j in range(m.njnt):
    k = m.jnt_stiffness[j]
    qadr = m.jnt_qposadr[j]
    jt = m.jnt_type[j]
    if jt in (_J.HINGE, _J.SLIDE):
      dif = d.qpos[qadr] - m.qpos_spring[qadr]
      pot = pot + 0.5 * k * dif * dif
    elif jt == _J.BALL:
      dif = mops.quat_sub(d.qpos[qadr:qadr + 4],
                          m.qpos_spring[qadr:qadr + 4])
      pot = pot + 0.5 * k * jnp.sum(dif * dif)
    else:
      dif = d.qpos[qadr:qadr + 3] - m.qpos_spring[qadr:qadr + 3]
      pot = pot + 0.5 * k * jnp.sum(dif * dif)
      difq = mops.quat_sub(d.qpos[qadr + 3:qadr + 7],
                           m.qpos_spring[qadr + 3:qadr + 7])
      pot = pot + 0.5 * k * jnp.sum(difq * difq)
  if m.ntendon:
    ref = jnp.where(m.tendon_lengthspring[:, 0] < 0,
                    m.tendon_length0, m.tendon_lengthspring[:, 0])
    dif = d.ten_length - ref
    pot = pot + 0.5 * jnp.sum(m.tendon_stiffness * dif * dif)
  kin = 0.5 * d.qvel @ (d.qM @ d.qvel)
  return d.replace(energy=jnp.stack([pot, kin]))


def _check_health(m: Model, d: Data) -> Data:
  bad = jnp.zeros((), dtype=bool)
  for x in (d.qpos, d.qvel, d.qacc):
    bad = bad | ~jnp.all(jnp.isfinite(x))
  bad = bad | jnp.any(jnp.abs(d.qacc) > 1e10)
  bad = bad | jnp.any(jnp.abs(d.qvel) > 1e10)
  return d.replace(divergence=bad)


# ---------------------------------------------------------------------------
# integration
# ---------------------------------------------------------------------------


def integrate_pos(m: Model, qpos: jax.Array, qvel: jax.Array,
                  dt) -> jax.Array:
  """Quaternion-aware position integration (mj_integratePos).

  Scalar (hinge/slide) joints and free-joint translations integrate as
  ONE vectorized scatter each — a 56-dof humanoid_CMU otherwise traces
  56 sequential dynamic-update ops, which blows up compile time.
  Quaternion joints (few per model) keep the per-joint exact update.
  """
  out = qpos
  qadr_1, vadr_1 = [], []
  for j in range(m.njnt):
    jt = m.jnt_type[j]
    qadr, vadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
    if jt == _J.FREE:
      qadr_1.extend(range(qadr, qadr + 3))
      vadr_1.extend(range(vadr, vadr + 3))
      q = mops.quat_integrate(qpos[qadr + 3:qadr + 7],
                              qvel[vadr + 3:vadr + 6], dt)
      out = out.at[qadr + 3:qadr + 7].set(q)
    elif jt == _J.BALL:
      q = mops.quat_integrate(qpos[qadr:qadr + 4],
                              qvel[vadr:vadr + 3], dt)
      out = out.at[qadr:qadr + 4].set(q)
    else:
      qadr_1.append(qadr)
      vadr_1.append(vadr)
  if qadr_1:
    qi = np.asarray(qadr_1)
    vi = np.asarray(vadr_1)
    out = out.at[qi].set(qpos[qi] + dt * qvel[vi])
  return out


def _advance(m: Model, d: Data, qacc: jax.Array,
             act_dot: jax.Array) -> Data:
  dt = m.opt.timestep.astype(d.qpos.dtype)
  qvel = d.qvel + dt * qacc
  qpos = integrate_pos(m, d.qpos, qvel, dt)
  act = d.act + dt * act_dot
  if m.na and any(m.actuator_dyntype[u] == constants.DynType.FILTEREXACT
                  for u in range(m.nu)):
    # FILTEREXACT uses the exact exponential discretization
    # act += act_dot * tau * (1 - exp(-dt/tau)) instead of Euler
    # (oracle mj_advance / mj_nextActivation, engine_forward.c)
    per_slot_u = np.array([u for u in range(m.nu)
                           for _ in range(int(m.actuator_actnum[u]))])
    exact = np.array(m.actuator_dyntype)[per_slot_u] == int(
        constants.DynType.FILTEREXACT)
    tau = jnp.maximum(
        jnp.asarray(m.actuator_dynprm)[per_slot_u, 0],
        1e-8).astype(d.qpos.dtype)
    h_eff = jnp.where(jnp.asarray(exact), tau * -jnp.expm1(-dt / tau),
                      dt)
    act = d.act + h_eff * act_dot
  if m.na:
    per_slot_u = np.array([u for u in range(m.nu)
                           for _ in range(int(m.actuator_actnum[u]))])
    limited = jnp.asarray(
        np.array(m.actuator_actlimited)[per_slot_u].astype(bool))
    rng = jnp.asarray(m.actuator_actrange)[per_slot_u]
    act = jnp.where(limited, jnp.clip(act, rng[:, 0], rng[:, 1]), act)
  return d.replace(qpos=qpos, qvel=qvel, act=act, time=d.time + dt)


def _euler(m: Model, d: Data) -> Data:
  """Semi-implicit Euler with implicit-in-velocity joint damping."""
  dt = m.opt.timestep.astype(d.qpos.dtype)
  # implicit damping solve: (M + h diag(damping)) qacc' = qfrc_total
  qfrc = d.qfrc_smooth + d.qfrc_constraint
  mhd = d.qM + dt * jnp.diag(m.dof_damping)
  qacc_int = linalg.solve_psd(mhd, qfrc)
  return _advance(m, d, qacc_int, d.act_dot)


def _qderiv_implicitfast(m: Model, d: Data) -> jax.Array:
  """-∂qfrc/∂qvel for the implicitfast velocity integration.

  Covers the analytically cheap velocity derivatives the reference
  engine's implicitfast mode uses (mjd_smooth_vel minus the Coriolis
  term, reference semantics documented at
  dm_control/mujoco/engine.py model options; oracle mj_implicitSkip):
    - joint damping:            +diag(dof_damping)
    - tendon damping:           +J_ten^T diag(b_ten) J_ten
    - actuator velocity gains:  -moment^T diag(∂force/∂vel) moment
  Fluid drag (density/viscosity) derivatives are not included; models
  relying on medium forces should use Euler or RK4.
  Returns the (nv, nv) matrix D with the integration solving
  (M + h D) qacc = qfrc_total.
  """
  dtype = d.qpos.dtype
  D = jnp.diag(m.dof_damping.astype(dtype))
  if m.ntendon:
    b = m.tendon_damping.astype(dtype)
    D = D + jnp.einsum('tv,t,tw->vw', d.ten_J, b, d.ten_J)
  if m.nu:
    # force = gain(l, v) * input + bias(l, v);
    # ∂force/∂v = gainprm[2] * input + biasprm[2]
    gaintype = np.array(m.actuator_gaintype)
    biastype = np.array(m.actuator_biastype)
    gp2 = np.asarray(m.actuator_gainprm)[:, 2]
    bp2 = np.asarray(m.actuator_biasprm)[:, 2]
    has_g = (gaintype == int(constants.GainType.AFFINE)) & (gp2 != 0)
    has_b = (biastype == int(constants.BiasType.AFFINE)) & (bp2 != 0)
    if np.any(has_g) or np.any(has_b):
      # input: ctrl for stateless actuators, act slot otherwise
      ctrl = d.ctrl
      if not (m.opt.disableflags & constants.DisableBit.CLAMPCTRL):
        limited = jnp.array(m.actuator_ctrllimited, dtype=bool)
        clamped = jnp.clip(ctrl, m.actuator_ctrlrange[:, 0],
                           m.actuator_ctrlrange[:, 1])
        ctrl = jnp.where(limited, clamped, ctrl)
      dyntypes = np.array(m.actuator_dyntype)
      stateful = np.where(dyntypes != int(constants.DynType.NONE))[0]
      if len(stateful):
        adrs = np.array(m.actuator_actadr)[stateful]
        ctrl = ctrl.at[stateful].set(d.act[adrs])
      dfdv = (jnp.where(jnp.asarray(has_g), jnp.asarray(gp2, dtype), 0.0)
              * ctrl +
              jnp.where(jnp.asarray(has_b), jnp.asarray(bp2, dtype), 0.0))
      D = D - jnp.einsum('uv,u,uw->vw', d.actuator_moment, dfdv,
                         d.actuator_moment)
  return D


def _implicitfast(m: Model, d: Data) -> Data:
  """implicitfast integration: implicit in the velocity derivatives of
  passive and actuator forces (reference option integrator=implicitfast)."""
  dt = m.opt.timestep.astype(d.qpos.dtype)
  qfrc = d.qfrc_smooth + d.qfrc_constraint
  A = d.qM + dt * _qderiv_implicitfast(m, d)
  qacc_int = linalg.solve_psd(A, qfrc)
  return _advance(m, d, qacc_int, d.act_dot)


_RK4_A = ((0.5,), (0.0, 0.5), (0.0, 0.0, 1.0))
_RK4_B = (1.0 / 6, 1.0 / 3, 1.0 / 3, 1.0 / 6)


def _rk4(m: Model, d: Data) -> Data:
  dt = m.opt.timestep.astype(d.qpos.dtype)
  d0 = d
  kv = [d.qvel]
  ka = [d.qacc]
  kad = [d.act_dot]
  for i, arow in enumerate(_RK4_A):
    # stage state
    dq = sum(a * v for a, v in zip(arow, kv) if a)
    dv = sum(a * acc for a, acc in zip(arow, ka) if a)
    dact = sum(a * ad for a, ad in zip(arow, kad) if a)
    qpos = integrate_pos(m, d0.qpos, dq, dt)
    di = d0.replace(qpos=qpos, qvel=d0.qvel + dt * dv,
                    act=d0.act + dt * dact if m.na else d0.act)
    di = forward_core(m, di)
    kv.append(di.qvel)
    ka.append(di.qacc)
    kad.append(di.act_dot)
  vbar = sum(b * v for b, v in zip(_RK4_B, kv))
  abar = sum(b * a for b, a in zip(_RK4_B, ka))
  adbar = sum(b * ad for b, ad in zip(_RK4_B, kad))
  qpos = integrate_pos(m, d0.qpos, vbar, dt)
  qvel = d0.qvel + dt * abar
  act = d0.act + dt * adbar if m.na else d0.act
  return d0.replace(qpos=qpos, qvel=qvel, act=act, time=d0.time + dt)


def _integrate(m: Model, d: Data) -> Data:
  integ = int(m.opt.integrator)
  if integ == constants.IntegratorType.RK4:
    return _rk4(m, d)
  if integ == constants.IntegratorType.IMPLICITFAST:
    return _implicitfast(m, d)
  if integ == constants.IntegratorType.IMPLICIT:
    raise NotImplementedError(
        'integrator="implicit" is not implemented (needs ∂RNE/∂qvel); '
        'use implicitfast, Euler or RK4')
  return _euler(m, d)


def step(m: Model, d: Data) -> Data:
  """One simulation step: forward dynamics + integration."""
  d = forward(m, d)
  return _integrate(m, d)


# ---------------------------------------------------------------------------
# batched step path (explicit env axis; TPU rollout fast path)
# ---------------------------------------------------------------------------

# Everything elementwise in the pipeline vmaps for free; what does NOT
# is the sequence of small SPD solves (the Newton direction solve and
# the implicit-damping Euler solve). Those run as single Pallas kernels
# over the whole batch when the env axis is explicit (see
# ops/pallas_kernels.py), so the rollout path below keeps the batch
# axis visible instead of vmapping `step`.


def _vm(fn, m: Model):
  return jax.vmap(lambda d: fn(m, d))


def fwd_aa_batched(m: Model, D: Data,
                   compute_sensors: bool = True) -> Data:
  """Batched actuation + acceleration + constraint + acc sensors."""
  D = _vm(fwd_actuation, m)(D)
  D = fwd_acceleration_batched(m, D)
  D = constraint.fwd_constraint_batched(m, D,
                                        compute_forces=compute_sensors)
  if compute_sensors:
    D = jax.vmap(lambda d: sensor_ops.sensors(m, d, stages='acc'))(D)
  return D


def forward_core_batched(m: Model, D: Data) -> Data:
  D = jax.vmap(lambda d: fwd_position(m, d, factor=False))(D)
  D = _vm(fwd_velocity, m)(D)
  D = _vm(fwd_actuation, m)(D)
  D = fwd_acceleration_batched(m, D)
  # RK4 stage solves only need qacc; forces are refreshed by the
  # pre-integration forward_batched pass
  return constraint.fwd_constraint_batched(m, D, compute_forces=False)


def forward_batched(m: Model, D: Data,
                    compute_sensors: bool = True) -> Data:
  D = jax.vmap(lambda d: fwd_pv(m, d, compute_sensors, factor=False))(D)
  return fwd_aa_batched(m, D, compute_sensors)


def _euler_batched(m: Model, D: Data) -> Data:
  from dm_control_tpu.ops import pallas_kernels
  dt = m.opt.timestep.astype(D.qpos.dtype)
  qfrc = D.qfrc_smooth + D.qfrc_constraint
  mhd = D.qM + dt * jnp.diag(m.dof_damping)[None]
  qacc_int = pallas_kernels.chol_solve_batched(mhd, qfrc)
  return jax.vmap(lambda d, qa: _advance(m, d, qa, d.act_dot))(
      D, qacc_int)


def _implicitfast_batched(m: Model, D: Data) -> Data:
  from dm_control_tpu.ops import pallas_kernels
  dt = m.opt.timestep.astype(D.qpos.dtype)
  qfrc = D.qfrc_smooth + D.qfrc_constraint
  Dv = jax.vmap(lambda d: _qderiv_implicitfast(m, d))(D)
  A = D.qM + dt * Dv
  qacc_int = pallas_kernels.chol_solve_batched(A, qfrc)
  return jax.vmap(lambda d, qa: _advance(m, d, qa, d.act_dot))(
      D, qacc_int)


def _rk4_batched(m: Model, D: Data) -> Data:
  dt = m.opt.timestep.astype(D.qpos.dtype)
  ipos = jax.vmap(lambda q, v: integrate_pos(m, q, v, dt))
  D0 = D
  kv, ka, kad = [D.qvel], [D.qacc], [D.act_dot]
  for arow in _RK4_A:
    dq = sum(a * v for a, v in zip(arow, kv) if a)
    dv = sum(a * acc for a, acc in zip(arow, ka) if a)
    dact = sum(a * ad for a, ad in zip(arow, kad) if a)
    qpos = ipos(D0.qpos, dq)
    Di = D0.replace(qpos=qpos, qvel=D0.qvel + dt * dv,
                    act=D0.act + dt * dact if m.na else D0.act)
    Di = forward_core_batched(m, Di)
    kv.append(Di.qvel)
    ka.append(Di.qacc)
    kad.append(Di.act_dot)
  vbar = sum(b * v for b, v in zip(_RK4_B, kv))
  abar = sum(b * a for b, a in zip(_RK4_B, ka))
  adbar = sum(b * ad for b, ad in zip(_RK4_B, kad))
  qpos = ipos(D0.qpos, vbar)
  return D0.replace(qpos=qpos, qvel=D0.qvel + dt * abar,
                    act=D0.act + dt * adbar if m.na else D0.act,
                    time=D0.time + dt)


def step_batched(m: Model, D: Data,
                 compute_sensors: bool = True) -> Data:
  """One simulation step over a leading env axis (batched solves).

  `compute_sensors=False` skips per-substep sensor evaluation — the
  rollout path reads sensors only from the post-substep pv refresh,
  and acc-stage sensordata is not reconstructible from the slim carry
  anyway (it is zeros in batched observations either way).
  """
  D = forward_batched(m, D, compute_sensors)
  integ = int(m.opt.integrator)
  if integ == constants.IntegratorType.RK4:
    return _rk4_batched(m, D)
  if integ == constants.IntegratorType.IMPLICITFAST:
    return _implicitfast_batched(m, D)
  if integ == constants.IntegratorType.IMPLICIT:
    raise NotImplementedError(
        'integrator="implicit" is not implemented (needs ∂RNE/∂qvel); '
        'use implicitfast, Euler or RK4')
  return _euler_batched(m, D)


# ---------------------------------------------------------------------------
# slim state carry (TPU rollout fast path)
# ---------------------------------------------------------------------------

# The minimal fields that determine the next step. Everything else in Data
# is derived and is recomputed by the forward pipeline, so rollout scans
# carry only these (~300 B/env instead of the ~40 kB full Data pytree —
# scan carries round-trip HBM every iteration, so this is a first-order
# throughput lever). sensordata rides along so acc-stage sensor values
# keep the reference's legacy-step semantics (fresh from the last
# substep's constraint solve; reference dm_control/mujoco/engine.py:147).
SLIM_STATE_FIELDS = (
    'time', 'qpos', 'qvel', 'act', 'ctrl', 'qacc', 'qacc_warmstart',
    'sensordata',
)


def slim_state(d: Data) -> dict:
  """Extract the minimal carry state from a Data pytree."""
  return {f: getattr(d, f) for f in SLIM_STATE_FIELDS}


def inflate(m: Model, s: dict) -> Data:
  """Rebuild a full Data around a slim state.

  The derived fields are fresh zero templates (trace-time constants under
  jit — they cost nothing until overwritten by the forward pipeline).
  """
  from dm_control_tpu.models import types as _types
  d = _types.make_data(m, dtype=s['qpos'].dtype)
  return d.replace(**s)
