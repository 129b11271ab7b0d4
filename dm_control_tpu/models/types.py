"""Core device-resident data model: Option, Model, Data.

Design (TPU-first, deliberately NOT a translation of the C struct layout):

  * `Model` is a JAX pytree. Float parameter arrays (masses, positions,
    gains, ...) are *data leaves* — they can be batched/randomized under
    vmap without retracing. Structural integers (tree topology, joint
    types, addresses) are *static metadata* stored as hashable tuples, so
    they participate in the jit cache key and can drive Python-level
    specialization at trace time (unrolled tree levels, static contact
    slots, static constraint-row layout).
  * `Data` is a pure pytree of arrays: the complete per-environment state
    plus every derived quantity. Batched simulation is `vmap` over `Data`
    (and optionally over copies of `Model` data leaves).

Field names deliberately mirror the public mjModel/mjData vocabulary so the
named-indexing layer (reference: dm_control/mujoco/index.py) carries over,
but shapes are dense/padded for static-shape XLA compilation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from dm_control_tpu.models import constants

# Markers for pytree registration.
_META = {'pytree_node': False}


def _field(meta: bool = False, **kwargs):
  return dataclasses.field(metadata=_META if meta else None, **kwargs)


def _register(cls):
  """Register a dataclass as a pytree, honoring the meta field marker."""
  data_fields = []
  meta_fields = []
  for f in dataclasses.fields(cls):
    if f.metadata.get('pytree_node', True):
      data_fields.append(f.name)
    else:
      meta_fields.append(f.name)
  jax.tree_util.register_dataclass(
      cls, data_fields=data_fields, meta_fields=meta_fields)
  return cls


class _Base:
  """Common replace() helper."""

  def replace(self, **updates):
    return dataclasses.replace(self, **updates)

  def tree_replace(self, params: dict):
    out = self
    for k, v in params.items():
      out = out.replace(**{k: v})
    return out


@_register
@dataclasses.dataclass(frozen=True)
class Option(_Base):
  """Simulation options (mirrors the MJCF <option> element semantics)."""
  # --- data (differentiable / randomizable) ---
  timestep: jax.Array
  gravity: jax.Array          # (3,)
  wind: jax.Array             # (3,)
  magnetic: jax.Array         # (3,)
  density: jax.Array          # scalar, fluid density
  viscosity: jax.Array        # scalar, fluid viscosity
  impratio: jax.Array         # scalar
  tolerance: jax.Array        # scalar, solver early-exit tolerance
  # --- static ---
  integrator: int = _field(meta=True, default=0)   # IntegratorType
  cone: int = _field(meta=True, default=0)          # ConeType
  solver_iterations: int = _field(meta=True, default=8)
  ls_iterations: int = _field(meta=True, default=8)
  disableflags: int = _field(meta=True, default=0)
  enableflags: int = _field(meta=True, default=0)


@_register
@dataclasses.dataclass(frozen=True)
class Model(_Base):
  """Compiled model: static structure + device-resident parameters."""

  # ======== static sizes ========
  nq: int = _field(meta=True, default=0)
  nv: int = _field(meta=True, default=0)
  nu: int = _field(meta=True, default=0)
  na: int = _field(meta=True, default=0)
  nbody: int = _field(meta=True, default=1)
  njnt: int = _field(meta=True, default=0)
  ngeom: int = _field(meta=True, default=0)
  nsite: int = _field(meta=True, default=0)
  ncam: int = _field(meta=True, default=0)
  nlight: int = _field(meta=True, default=0)
  ntendon: int = _field(meta=True, default=0)
  nwrap: int = _field(meta=True, default=0)
  nsensor: int = _field(meta=True, default=0)
  nsensordata: int = _field(meta=True, default=0)
  neq: int = _field(meta=True, default=0)
  nmocap: int = _field(meta=True, default=0)
  nkey: int = _field(meta=True, default=0)

  # ======== static structure (hashable tuples of ints) ========
  body_parentid: Tuple[int, ...] = _field(meta=True, default=())
  body_rootid: Tuple[int, ...] = _field(meta=True, default=())
  body_weldid: Tuple[int, ...] = _field(meta=True, default=())
  body_jntadr: Tuple[int, ...] = _field(meta=True, default=())
  body_jntnum: Tuple[int, ...] = _field(meta=True, default=())
  body_dofadr: Tuple[int, ...] = _field(meta=True, default=())
  body_dofnum: Tuple[int, ...] = _field(meta=True, default=())
  body_mocapid: Tuple[int, ...] = _field(meta=True, default=())
  body_treelevel: Tuple[int, ...] = _field(meta=True, default=())

  jnt_type: Tuple[int, ...] = _field(meta=True, default=())
  jnt_qposadr: Tuple[int, ...] = _field(meta=True, default=())
  jnt_dofadr: Tuple[int, ...] = _field(meta=True, default=())
  jnt_bodyid: Tuple[int, ...] = _field(meta=True, default=())
  jnt_limited: Tuple[int, ...] = _field(meta=True, default=())
  jnt_actgravcomp: Tuple[int, ...] = _field(meta=True, default=())
  # (timeconst, dampratio) per joint; (0, 0) when unset. Resolved by the
  # calibration pass into jnt_stiffness/dof_damping (oracle semantics:
  # k = M/(timeconst*dampratio)^2, d = 2M/timeconst, M = 1/dof_invweight0)
  jnt_springdamper: Tuple[Tuple[float, float], ...] = _field(
      meta=True, default=())

  dof_bodyid: Tuple[int, ...] = _field(meta=True, default=())
  dof_jntid: Tuple[int, ...] = _field(meta=True, default=())
  dof_parentid: Tuple[int, ...] = _field(meta=True, default=())
  # static marker: which dofs carry a frictionloss constraint row
  dof_hasfrictionloss: Tuple[int, ...] = _field(meta=True, default=())

  geom_type: Tuple[int, ...] = _field(meta=True, default=())
  geom_bodyid: Tuple[int, ...] = _field(meta=True, default=())
  geom_contype: Tuple[int, ...] = _field(meta=True, default=())
  geom_conaffinity: Tuple[int, ...] = _field(meta=True, default=())
  geom_condim: Tuple[int, ...] = _field(meta=True, default=())
  geom_priority: Tuple[int, ...] = _field(meta=True, default=())
  geom_dataid: Tuple[int, ...] = _field(meta=True, default=())

  # heightfields: grid shape/addressing is static (shapes); elevation
  # data is a device leaf so tasks can re-randomize terrain per episode
  # (reference suite/quadruped.py Escape writes model.hfield_data)
  nhfield: int = _field(meta=True, default=0)
  hfield_nrow: Tuple[int, ...] = _field(meta=True, default=())
  hfield_ncol: Tuple[int, ...] = _field(meta=True, default=())
  hfield_adr: Tuple[int, ...] = _field(meta=True, default=())

  # meshes: convex-hull vertex sets in the baked (principal inertial)
  # frame; addressing static, vertex data a device leaf. Used by the
  # hull narrowphase (support functions) and the renderer.
  nmesh: int = _field(meta=True, default=0)
  mesh_vertadr: Tuple[int, ...] = _field(meta=True, default=())
  mesh_vertnum: Tuple[int, ...] = _field(meta=True, default=())

  site_bodyid: Tuple[int, ...] = _field(meta=True, default=())
  site_type: Tuple[int, ...] = _field(meta=True, default=())
  cam_bodyid: Tuple[int, ...] = _field(meta=True, default=())
  cam_mode: Tuple[int, ...] = _field(meta=True, default=())
  cam_targetbodyid: Tuple[int, ...] = _field(meta=True, default=())

  actuator_trntype: Tuple[int, ...] = _field(meta=True, default=())
  actuator_dyntype: Tuple[int, ...] = _field(meta=True, default=())
  actuator_gaintype: Tuple[int, ...] = _field(meta=True, default=())
  actuator_biastype: Tuple[int, ...] = _field(meta=True, default=())
  actuator_trnid: Tuple[Tuple[int, int], ...] = _field(meta=True, default=())
  actuator_actadr: Tuple[int, ...] = _field(meta=True, default=())
  actuator_actnum: Tuple[int, ...] = _field(meta=True, default=())
  actuator_ctrllimited: Tuple[int, ...] = _field(meta=True, default=())
  actuator_forcelimited: Tuple[int, ...] = _field(meta=True, default=())
  actuator_actlimited: Tuple[int, ...] = _field(meta=True, default=())

  tendon_adr: Tuple[int, ...] = _field(meta=True, default=())
  tendon_num: Tuple[int, ...] = _field(meta=True, default=())
  tendon_limited: Tuple[int, ...] = _field(meta=True, default=())
  wrap_type: Tuple[int, ...] = _field(meta=True, default=())
  wrap_objid: Tuple[int, ...] = _field(meta=True, default=())

  sensor_type: Tuple[int, ...] = _field(meta=True, default=())
  sensor_objtype: Tuple[int, ...] = _field(meta=True, default=())
  sensor_objid: Tuple[int, ...] = _field(meta=True, default=())
  sensor_adr: Tuple[int, ...] = _field(meta=True, default=())
  sensor_dim: Tuple[int, ...] = _field(meta=True, default=())

  eq_type: Tuple[int, ...] = _field(meta=True, default=())
  eq_obj1id: Tuple[int, ...] = _field(meta=True, default=())
  eq_obj2id: Tuple[int, ...] = _field(meta=True, default=())

  # contact candidate pairs, precomputed at compile time:
  # slot-level view (one entry per padded narrowphase slot)
  pair_geom1: Tuple[int, ...] = _field(meta=True, default=())
  pair_geom2: Tuple[int, ...] = _field(meta=True, default=())
  pair_condim: Tuple[int, ...] = _field(meta=True, default=())
  # post-selection ("compacted") contact slot layout: for big models the
  # narrowphase slots are reduced each step to the deepest ncon_sel
  # contacts per condim group (TPU-native runtime broadphase — keeps the
  # constraint system small and static). sel_condim[i] is the condim of
  # compacted slot i; == pair_condim when no selection happens.
  sel_condim: Tuple[int, ...] = _field(meta=True, default=())
  # candidate-level view (one entry per geom pair; each expands to a
  # static number of slots according to the pair's type signature)
  cpair_geom1: Tuple[int, ...] = _field(meta=True, default=())
  cpair_geom2: Tuple[int, ...] = _field(meta=True, default=())
  cpair_condim: Tuple[int, ...] = _field(meta=True, default=())
  cpair_explicit: Tuple[int, ...] = _field(meta=True, default=())
  # explicit <contact><pair> parameter arrays (data)
  npair_explicit: int = _field(meta=True, default=0)

  # names (for the index layer; part of the jit key, which is fine: a
  # renamed model is a different model)
  names: Any = _field(meta=True, default=None)   # frozen dict-like

  # ======== device-resident parameters (data leaves) ========
  qpos0: jax.Array = None
  qpos_spring: jax.Array = None

  body_pos: jax.Array = None
  body_quat: jax.Array = None
  body_ipos: jax.Array = None
  body_iquat: jax.Array = None
  body_mass: jax.Array = None
  body_subtreemass: jax.Array = None
  body_inertia: jax.Array = None      # (nbody, 3) principal
  body_invweight0: jax.Array = None   # (nbody, 2)
  body_gravcomp: jax.Array = None     # (nbody,)

  jnt_pos: jax.Array = None
  jnt_axis: jax.Array = None
  jnt_range: jax.Array = None
  jnt_stiffness: jax.Array = None
  jnt_solref: jax.Array = None        # (njnt, 2) for limits
  jnt_solimp: jax.Array = None        # (njnt, 5)
  jnt_margin: jax.Array = None

  dof_armature: jax.Array = None
  dof_damping: jax.Array = None
  dof_invweight0: jax.Array = None
  dof_frictionloss: jax.Array = None

  geom_pos: jax.Array = None
  geom_quat: jax.Array = None
  geom_size: jax.Array = None
  geom_friction: jax.Array = None
  geom_solref: jax.Array = None
  geom_solimp: jax.Array = None
  geom_solmix: jax.Array = None
  geom_margin: jax.Array = None
  geom_gap: jax.Array = None
  geom_rgba: jax.Array = None

  # ---- visual assets (meta: consumed at trace time by the renderer;
  # reference appearance pipeline at dm_control/mujoco/engine.py render
  # + mjv material resolution) ----
  geom_matid: Tuple[int, ...] = _field(meta=True, default=())
  mat_texid: Tuple[int, ...] = _field(meta=True, default=())
  mat_texrepeat: Tuple = _field(meta=True, default=())   # ((u, v), ...)
  mat_texuniform: Tuple[int, ...] = _field(meta=True, default=())
  mat_rgba: Tuple = _field(meta=True, default=())        # ((r,g,b,a),..)
  mat_specular: Tuple = _field(meta=True, default=())
  mat_shininess: Tuple = _field(meta=True, default=())
  mat_emission: Tuple = _field(meta=True, default=())
  mat_reflectance: Tuple = _field(meta=True, default=())
  tex_type: Tuple[int, ...] = _field(meta=True, default=())   # TexType
  tex_builtin: Tuple[int, ...] = _field(meta=True, default=())
  tex_rgb1: Tuple = _field(meta=True, default=())
  tex_rgb2: Tuple = _field(meta=True, default=())
  tex_mark: Tuple[int, ...] = _field(meta=True, default=())
  tex_markrgb: Tuple = _field(meta=True, default=())
  tex_width: Tuple[int, ...] = _field(meta=True, default=())
  tex_height: Tuple[int, ...] = _field(meta=True, default=())
  # (ambient rgb, diffuse rgb, specular rgb, active) — <visual><headlight>
  vis_headlight: Tuple = _field(
      meta=True,
      default=(0.1, 0.1, 0.1, 0.4, 0.4, 0.4, 0.5, 0.5, 0.5, 1.0))

  hfield_size: jax.Array = None     # (nhfield, 4) rx ry ztop zbottom
  hfield_data: jax.Array = None     # (sum nrow*ncol,) normalized [0,1]

  mesh_vert: jax.Array = None       # (sum mesh_vertnum, 3) hull verts

  site_pos: jax.Array = None
  site_quat: jax.Array = None
  site_size: jax.Array = None

  cam_pos: jax.Array = None
  cam_quat: jax.Array = None
  cam_fovy: jax.Array = None

  actuator_gear: jax.Array = None        # (nu, 6)
  actuator_ctrlrange: jax.Array = None   # (nu, 2)
  actuator_forcerange: jax.Array = None
  actuator_actrange: jax.Array = None
  actuator_dynprm: jax.Array = None      # (nu, 3)
  actuator_gainprm: jax.Array = None     # (nu, 9)
  actuator_biasprm: jax.Array = None     # (nu, 9)
  actuator_acc0: jax.Array = None        # (nu,)

  tendon_range: jax.Array = None
  tendon_stiffness: jax.Array = None
  tendon_damping: jax.Array = None
  tendon_lengthspring: jax.Array = None  # (ntendon, 2)
  tendon_length0: jax.Array = None
  tendon_invweight0: jax.Array = None
  tendon_solref_lim: jax.Array = None
  tendon_solimp_lim: jax.Array = None
  tendon_margin: jax.Array = None
  wrap_prm: jax.Array = None             # (nwrap,) fixed-tendon coefs etc.

  eq_data: jax.Array = None              # (neq, 11)
  eq_solref: jax.Array = None
  eq_solimp: jax.Array = None
  eq_active0: jax.Array = None           # (neq,)

  sensor_cutoff: jax.Array = None

  # explicit contact-pair params (npair_explicit rows; may be empty)
  xpair_friction: jax.Array = None   # (np, 5)
  xpair_solref: jax.Array = None     # (np, 2)
  xpair_solimp: jax.Array = None     # (np, 5)
  xpair_margin: jax.Array = None     # (np,)
  xpair_gap: jax.Array = None        # (np,)

  key_qpos: jax.Array = None             # (nkey, nq)
  key_qvel: jax.Array = None
  key_ctrl: jax.Array = None

  # precomputed structure masks (data: used in matmuls, never randomized)
  # S[b, c] = 1 if body c is in the subtree rooted at body b
  subtree_mask: jax.Array = None         # (nbody, nbody)
  # A[b, d] = 1 if dof d is on the path world->body b (inclusive)
  body_dof_mask: jax.Array = None        # (nbody, nv)
  # AD[i, j] = 1 if dof j is an ancestor of dof i or j == i
  dof_ancestor_mask: jax.Array = None    # (nv, nv)
  # M_mask[i, j] = 1 where the joint-space inertia matrix is structurally
  # nonzero (same kinematic chain)
  qM_mask: jax.Array = None              # (nv, nv)
  # V[d, d'] = 1 if dof d' contributes to the partial velocity seen by the
  # axis of dof d (ancestors outside d's joint; for free-joint rotation
  # dofs, also the translational dofs of the same joint)
  dof_vel_mask: jax.Array = None         # (nv, nv)

  opt: Option = None

  # padded capacities (static)
  ncon_max: int = _field(meta=True, default=0)   # narrowphase slots
  ncon_sel: int = _field(meta=True, default=0)   # compacted contact slots
  nefc_max: int = _field(meta=True, default=0)

  @property
  def name2id(self):
    return self.names.name2id if self.names is not None else {}

  def id2name(self, objtype: str, idx: int) -> str:
    return self.names.id2name(objtype, idx)


@_register
@dataclasses.dataclass(frozen=True)
class Contact(_Base):
  """Padded contact set (compacted slots).

  Slots hold the deepest `ncon_sel` contacts per condim group after
  narrowphase (runtime top-K broadphase; slot -> geom pair is therefore
  data, not compile-time structure). `active` masks slots whose distance
  test actually fired this step. `overflow` flags steps where more
  contacts were active than the compacted budget (dropped contacts).
  """
  dist: jax.Array        # (ncon,)
  pos: jax.Array         # (ncon, 3)
  frame: jax.Array       # (ncon, 3, 3) rows = [normal, t1, t2]
  includemargin: jax.Array  # (ncon,) = margin - gap (constraint gate)
  friction: jax.Array    # (ncon, 5)
  solref: jax.Array      # (ncon, 2)
  solimp: jax.Array      # (ncon, 5)
  active: jax.Array      # (ncon,) bool
  force: jax.Array       # (ncon, 3) solved contact force in contact frame
  geom1: jax.Array = None  # (ncon,) int32 geom ids (data — see above)
  geom2: jax.Array = None  # (ncon,) int32
  overflow: jax.Array = None  # scalar bool
  gap: jax.Array = None  # (ncon,); dist < includemargin + gap means the
                         # contact EXISTS (adhesion acts in this band)
  # static slot metadata: condim per compacted slot
  dim: Tuple[int, ...] = _field(meta=True, default=())


@_register
@dataclasses.dataclass(frozen=True)
class Data(_Base):
  """Complete per-environment simulation state + derived quantities."""

  # state
  time: jax.Array
  qpos: jax.Array
  qvel: jax.Array
  act: jax.Array
  ctrl: jax.Array
  qacc: jax.Array
  qacc_warmstart: jax.Array
  qfrc_applied: jax.Array
  xfrc_applied: jax.Array     # (nbody, 6) [torque, force] at body com
  mocap_pos: jax.Array
  mocap_quat: jax.Array

  # position-stage products
  xpos: jax.Array
  xquat: jax.Array
  xmat: jax.Array
  xipos: jax.Array
  ximat: jax.Array
  xanchor: jax.Array
  xaxis: jax.Array
  geom_xpos: jax.Array
  geom_xmat: jax.Array
  site_xpos: jax.Array
  site_xmat: jax.Array
  subtree_com: jax.Array
  cinert: jax.Array           # (nbody, 6, 6)
  cdof: jax.Array             # (nv, 6)
  qM: jax.Array               # (nv, nv) dense
  qLD: jax.Array              # (nv, nv) transposed inverse Cholesky
                              # factor Kt = (L^-1)^T (see ops/linalg.py)
  ten_length: jax.Array
  ten_J: jax.Array            # (ntendon, nv)
  contact: Contact = None

  # velocity-stage products
  cvel: jax.Array = None      # (nbody, 6)
  cdof_dot: jax.Array = None  # (nv, 6)
  qfrc_bias: jax.Array = None
  qfrc_passive: jax.Array = None
  ten_velocity: jax.Array = None

  # actuation
  actuator_length: jax.Array = None
  actuator_moment: jax.Array = None  # (nu, nv)
  actuator_velocity: jax.Array = None
  actuator_force: jax.Array = None
  act_dot: jax.Array = None
  qfrc_actuator: jax.Array = None

  # acceleration stage
  qfrc_smooth: jax.Array = None
  qacc_smooth: jax.Array = None
  qfrc_constraint: jax.Array = None
  efc_force: jax.Array = None      # (nefc_max,)

  # post-constraint body accelerations (sensors)
  cacc: jax.Array = None           # (nbody, 6)
  cfrc_int: jax.Array = None       # (nbody, 6)

  sensordata: jax.Array = None
  energy: jax.Array = None         # (2,) potential, kinetic

  # health flags: nonfinite or exploding state detected
  divergence: jax.Array = None     # scalar bool
  solver_niter: jax.Array = None   # scalar int


def make_data(m: Model, dtype=jnp.float32) -> Data:
  """Allocate a fresh Data at qpos0 for model m.

  Leaves are host numpy arrays (zero eager dispatch); they convert to
  device arrays at the first jit boundary.
  """
  import numpy as np
  npdt = np.dtype(jnp.dtype(dtype).name)
  z = lambda *shape: np.zeros(shape, dtype=npdt)
  nb, nv, nq = m.nbody, m.nv, m.nq
  ncon = m.ncon_sel
  ident_quat = np.tile(
      np.array([1.0, 0, 0, 0], dtype=npdt), (nb, 1))
  ident_mat = np.tile(np.eye(3, dtype=npdt), (nb, 1, 1))
  contact = Contact(
      dist=z(ncon), pos=z(ncon, 3),
      frame=np.tile(np.eye(3, dtype=npdt), (ncon, 1, 1)),
      includemargin=z(ncon), gap=z(ncon),
      friction=np.ones((ncon, 5), dtype=npdt),
      solref=np.tile(np.array([0.02, 1.0], dtype=npdt), (ncon, 1)),
      solimp=np.tile(
          np.array([0.9, 0.95, 0.001, 0.5, 2.0], dtype=npdt), (ncon, 1)),
      active=np.zeros(ncon, dtype=bool),
      force=z(ncon, 3),
      geom1=np.zeros(ncon, dtype=np.int32),
      geom2=np.zeros(ncon, dtype=np.int32),
      overflow=np.zeros((), dtype=bool),
      dim=m.sel_condim)
  nmocap = max(m.nmocap, 1)
  return Data(
      time=np.zeros((), dtype=npdt),
      qpos=jnp.asarray(m.qpos0, dtype=dtype),
      qvel=z(nv), act=z(m.na), ctrl=z(m.nu), qacc=z(nv),
      qacc_warmstart=z(nv),
      qfrc_applied=z(nv), xfrc_applied=z(nb, 6),
      mocap_pos=z(nmocap, 3),
      mocap_quat=np.tile(np.array([1.0, 0, 0, 0], dtype=npdt),
                         (nmocap, 1)),
      xpos=z(nb, 3), xquat=ident_quat, xmat=ident_mat,
      xipos=z(nb, 3), ximat=ident_mat,
      xanchor=z(m.njnt, 3), xaxis=z(m.njnt, 3),
      geom_xpos=z(m.ngeom, 3),
      geom_xmat=np.tile(np.eye(3, dtype=npdt), (m.ngeom, 1, 1)),
      site_xpos=z(m.nsite, 3),
      site_xmat=np.tile(np.eye(3, dtype=npdt),
                        (max(m.nsite, 1), 1, 1))[:m.nsite],
      subtree_com=z(nb, 3),
      cinert=z(nb, 6, 6), cdof=z(nv, 6),
      qM=z(nv, nv), qLD=z(nv, nv),
      ten_length=z(m.ntendon), ten_J=z(m.ntendon, nv),
      contact=contact,
      cvel=z(nb, 6), cdof_dot=z(nv, 6),
      qfrc_bias=z(nv), qfrc_passive=z(nv), ten_velocity=z(m.ntendon),
      actuator_length=z(m.nu), actuator_moment=z(m.nu, nv),
      actuator_velocity=z(m.nu), actuator_force=z(m.nu),
      act_dot=z(m.na), qfrc_actuator=z(nv),
      qfrc_smooth=z(nv), qacc_smooth=z(nv), qfrc_constraint=z(nv),
      efc_force=z(m.nefc_max),
      cacc=z(nb, 6), cfrc_int=z(nb, 6),
      sensordata=z(m.nsensordata), energy=z(2),
      divergence=np.zeros((), dtype=bool),
      solver_niter=np.zeros((), dtype=np.int32),
  )
