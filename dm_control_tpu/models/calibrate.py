"""Post-compile calibration pass: quantities defined at qpos0.

Computes dof/body/tendon inverse weights (diagonal approximations of
J M^-1 J' used by the constraint impedance model), resting tendon lengths,
and equality-constraint auxiliary data — by running the engine's own
position stage at qpos0 on the host. One source of truth: the same jax
kinematics/CRB code used at runtime.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.models import constants
from dm_control_tpu.models import types


def calibrate(m: types.Model) -> types.Model:
  from dm_control_tpu.ops import smooth  # deferred: avoid import cycle

  cpu = jax.devices('cpu')[0]
  with jax.default_device(cpu):
    dtype0 = (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)

    @jax.jit
    def _position_stage(mm):
      d = types.make_data(mm, dtype=dtype0)
      d = smooth.kinematics(mm, d)
      d = smooth.com_pos(mm, d)
      d = smooth.tendon(mm, d)
      d = smooth.crb(mm, d)
      return d

    d = jax.device_get(_position_stage(m))
    qm = np.asarray(d.qM, dtype=np.float64)
    if m.nv:
      minv = np.linalg.inv(qm)
    else:
      minv = np.zeros((0, 0))

    dof_invweight0 = np.diag(minv).copy() if m.nv else np.zeros(0)

    # oracle convention (mj_setConst): free joints average the inverse-
    # inertia diagonal over the translation triple and the rotation
    # triple; ball joints average over their rotation triple — so the
    # constraint regularizer is isotropic per joint.
    for j in range(m.njnt):
      v = int(m.jnt_dofadr[j])
      jt = int(m.jnt_type[j])
      if jt == int(constants.JointType.FREE):
        dof_invweight0[v:v + 3] = dof_invweight0[v:v + 3].mean()
        dof_invweight0[v + 3:v + 6] = dof_invweight0[v + 3:v + 6].mean()
      elif jt == int(constants.JointType.BALL):
        dof_invweight0[v:v + 3] = dof_invweight0[v:v + 3].mean()

    # springdamper joints: the compiler overrides stiffness/damping to hit
    # the requested (timeconst, dampratio) with the apparent joint inertia
    # M = 1/dof_invweight0 (oracle convention, numerically verified:
    # k = M/(timeconst*dampratio)^2, d = 2*M/timeconst)
    jnt_stiffness = np.asarray(m.jnt_stiffness, dtype=np.float64).copy()
    dof_damping = np.asarray(m.dof_damping, dtype=np.float64).copy()
    sd_dirty = False
    for j, (tc, dr) in enumerate(m.jnt_springdamper):
      if tc > 0 and dr > 0:
        sd_dirty = True
        v = m.jnt_dofadr[j]
        M = 1.0 / max(dof_invweight0[v], 1e-300)
        jnt_stiffness[j] = M / (tc * dr) ** 2
        ndof = {int(constants.JointType.FREE): 6,
                int(constants.JointType.BALL): 3}.get(int(m.jnt_type[j]), 1)
        for k in range(ndof):
          Mk = 1.0 / max(dof_invweight0[v + k], 1e-300)
          dof_damping[v + k] = 2.0 * Mk / tc

    # "simple" leaf bodies (world parent, slide-only orthogonal joints,
    # centered inertia) use 1/mass directly, matching the oracle compiler
    def _simple2(b):
      if m.body_parentid[b] != 0:
        return False
      if any(m.body_parentid[c] == b for c in range(1, m.nbody)):
        return False
      jadr, jnum = m.body_jntadr[b], m.body_jntnum[b]
      if jnum == 0:
        return False
      axes = []
      for j in range(jadr, jadr + jnum):
        if m.jnt_type[j] != constants.JointType.SLIDE:
          return False
        axes.append(np.asarray(m.jnt_axis[j], dtype=np.float64))
      for i in range(len(axes)):
        for k in range(i + 1, len(axes)):
          if abs(np.dot(axes[i], axes[k])) > 1e-10:
            return False
      return bool(np.all(np.abs(np.asarray(m.body_ipos[b])) < 1e-12))

    # numpy jacobians (d holds host arrays here)
    cdof = np.asarray(d.cdof, dtype=np.float64)
    xipos = np.asarray(d.xipos, dtype=np.float64)
    scom = np.asarray(d.subtree_com, dtype=np.float64)
    dofmask = np.asarray(m.body_dof_mask, dtype=np.float64)

    body_invweight0 = np.zeros((m.nbody, 2))
    for b in range(1, m.nbody):
      if _simple2(b):
        mass = float(m.body_mass[b])
        body_invweight0[b, 0] = 1.0 / max(mass, 1e-12)
        continue
      offset = xipos[b] - scom[m.body_rootid[b]]
      ang = cdof[:, :3]
      lin = cdof[:, 3:] + np.cross(ang, offset[None, :])
      jacp = (lin * dofmask[b][:, None]).T
      jacr = (ang * dofmask[b][:, None]).T
      at = jacp @ minv @ jacp.T
      ar = jacr @ minv @ jacr.T
      body_invweight0[b, 0] = np.trace(at) / 3.0
      body_invweight0[b, 1] = np.trace(ar) / 3.0

    tendon_invweight0 = np.zeros(m.ntendon)
    tendon_length0 = np.zeros(m.ntendon)
    if m.ntendon:
      tj = np.asarray(d.ten_J, dtype=np.float64)
      tendon_invweight0 = np.einsum('tv,vw,tw->t', tj, minv, tj)
      tendon_length0 = np.asarray(d.ten_length, dtype=np.float64)

    # equality auxiliary data: connect anchor in body2 frame, weld relpose
    eq_data = np.asarray(m.eq_data, dtype=np.float64).copy()
    xpos = np.asarray(d.xpos, dtype=np.float64)
    xmat = np.asarray(d.xmat, dtype=np.float64)
    xquat = np.asarray(d.xquat, dtype=np.float64)
    for e in range(m.neq):
      b1, b2 = m.eq_obj1id[e], m.eq_obj2id[e]
      if m.eq_type[e] == constants.EqType.CONNECT:
        anchor_world = xpos[b1] + xmat[b1] @ eq_data[e, :3]
        eq_data[e, 3:6] = xmat[b2].T @ (anchor_world - xpos[b2])
      elif m.eq_type[e] == constants.EqType.WELD:
        given = eq_data[e, 3:10]
        if not np.any(given[:3]) and given[3] == 1.0 and not np.any(
            given[4:]):
          # compute current relative pose at qpos0
          relpos = xmat[b2].T @ (xpos[b1] - xpos[b2])
          q2inv = xquat[b2] * np.array([1.0, -1, -1, -1])
          w1, x1, y1, z1 = q2inv
          w2, x2, y2, z2 = xquat[b1]
          relquat = np.array([
              w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
              w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
              w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
              w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])
          eq_data[e, 3:6] = relpos
          eq_data[e, 6:10] = relquat

  dtype = np.asarray(m.qpos0).dtype
  if sd_dirty:
    m = m.replace(jnt_stiffness=np.asarray(jnt_stiffness, dtype=dtype),
                  dof_damping=np.asarray(dof_damping, dtype=dtype))
  return m.replace(
      dof_invweight0=np.asarray(dof_invweight0, dtype=dtype),
      body_invweight0=np.asarray(body_invweight0, dtype=dtype),
      tendon_invweight0=np.asarray(tendon_invweight0, dtype=dtype),
      tendon_length0=np.asarray(tendon_length0, dtype=dtype),
      eq_data=np.asarray(eq_data, dtype=dtype),
  )
