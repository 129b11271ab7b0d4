"""Inverse kinematics via damped least squares.

Behavioural counterpart of reference
dm_control/utils/inverse_kinematics.py:36-260 (`qpos_from_site_pose`),
built on the engine's analytic com-frame jacobians instead of mj_jacSite.
The Gauss-Newton loop runs on host with a jitted FK+jacobian kernel.
"""

from __future__ import annotations

import collections
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.models import constants
from dm_control_tpu.models import types
from dm_control_tpu.ops import math as mops
from dm_control_tpu.ops import smooth

IKResult = collections.namedtuple(
    'IKResult', ['qpos', 'err_norm', 'steps', 'success'])


_HOST_CACHE = {}


def _host_arrays(model: types.Model):
  """Float64 host copies of the model arrays the IK needs (cached)."""
  key = id(model)
  if key not in _HOST_CACHE:
    g = lambda name: np.asarray(jax.device_get(getattr(model, name)),
                                dtype=np.float64)
    _HOST_CACHE[key] = dict(
        body_pos=g('body_pos'), body_quat=g('body_quat'),
        jnt_pos=g('jnt_pos'), jnt_axis=g('jnt_axis'),
        qpos0=g('qpos0'), site_pos=g('site_pos'),
        site_quat=g('site_quat'))
  return _HOST_CACHE[key]


def _quat_mul_np(a, b):
  w1, x1, y1, z1 = a
  w2, x2, y2, z2 = b
  return np.array([
      w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
      w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
      w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
      w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])


def _quat_mat_np(q):
  w, x, y, z = q
  return np.array([
      [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
      [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
      [2 * (x * z - w * y), 2 * (y * z + w * x),
       1 - 2 * (x * x + y * y)]])


def _axis_angle_quat_np(axis, angle):
  half = 0.5 * angle
  return np.concatenate([[np.cos(half)], np.sin(half) * np.asarray(axis)])


def _fk_site(model: types.Model, site_id: int):
  """Returns fn: qpos -> (site_xpos, site_xquat, jacp, jacr).

  Full float64 host FK + analytic site Jacobian: the reference IK's
  quadratic convergence (tol 1e-14, consumed by
  entities/manipulators/base.py set_site_to_xpos) needs f64 — a device
  f32 FK caps the reachable error at ~1e-5 and IK would never succeed.
  """
  h = _host_arrays(model)
  _J = constants.JointType
  body = model.site_bodyid[site_id]
  # kinematic chain world -> site body, and its joints
  chain = []
  b = body
  while b != 0:
    chain.append(b)
    b = model.body_parentid[b]
  chain = chain[::-1]

  def fk(qpos):
    qpos = np.asarray(qpos, dtype=np.float64)
    xpos = np.zeros(3)
    xquat = np.array([1.0, 0, 0, 0])
    jacp_cols = {}
    jacr_cols = {}
    for b in chain:
      xpos = xpos + _quat_mat_np(xquat) @ h['body_pos'][b]
      xquat = _quat_mul_np(xquat, h['body_quat'][b])
      for ji in range(model.body_jntadr[b],
                      model.body_jntadr[b] + model.body_jntnum[b]):
        jt = model.jnt_type[ji]
        qadr = model.jnt_qposadr[ji]
        vadr = model.jnt_dofadr[ji]
        R = _quat_mat_np(xquat)
        if jt == _J.FREE:
          xpos = qpos[qadr:qadr + 3].copy()
          q = qpos[qadr + 3:qadr + 7]
          xquat = q / np.linalg.norm(q)
          R = _quat_mat_np(xquat)
          for i in range(3):
            jacp_cols[vadr + i] = (np.eye(3)[i], None)
          for i in range(3):
            jacr_cols[vadr + 3 + i] = (R[:, i], xpos.copy())
        elif jt == _J.BALL:
          anchor = R @ h['jnt_pos'][ji] + xpos
          q = qpos[qadr:qadr + 4]
          qn = q / np.linalg.norm(q)
          for i in range(3):
            jacr_cols[vadr + i] = (R[:, i], anchor.copy())
          xquat = _quat_mul_np(xquat, qn)
          xpos = anchor - _quat_mat_np(xquat) @ h['jnt_pos'][ji]
        elif jt == _J.SLIDE:
          axis = R @ h['jnt_axis'][ji]
          jacp_cols[vadr] = (axis, None)
          xpos = xpos + axis * (qpos[qadr] - h['qpos0'][qadr])
        else:  # HINGE
          anchor = R @ h['jnt_pos'][ji] + xpos
          axis = R @ h['jnt_axis'][ji]
          jacr_cols[vadr] = (axis, anchor.copy())
          qloc = _axis_angle_quat_np(h['jnt_axis'][ji],
                                     qpos[qadr] - h['qpos0'][qadr])
          xquat = _quat_mul_np(xquat, qloc)
          xpos = anchor - _quat_mat_np(xquat) @ h['jnt_pos'][ji]
    R = _quat_mat_np(xquat)
    pos = xpos + R @ h['site_pos'][site_id]
    quat = _quat_mul_np(xquat, h['site_quat'][site_id])
    jacp = np.zeros((3, model.nv))
    jacr = np.zeros((3, model.nv))
    for v, (axis, anchor) in jacp_cols.items():
      jacp[:, v] = axis
    for v, (axis, anchor) in jacr_cols.items():
      jacr[:, v] = axis
      jacp[:, v] = np.cross(axis, pos - anchor)
    return pos, quat, jacp, jacr

  return fk


def qpos_from_site_pose(physics_or_model,
                        site_name: str,
                        target_pos=None,
                        target_quat=None,
                        joint_names: Optional[Sequence[str]] = None,
                        tol: float = 1e-14,
                        rot_weight: float = 1.0,
                        regularization_threshold: float = 0.1,
                        regularization_strength: float = 3e-2,
                        max_update_norm: float = 2.0,
                        progress_thresh: float = 20.0,
                        max_steps: int = 100,
                        inplace: bool = False,
                        qpos0=None) -> IKResult:
  """Finds joint angles that bring a site to a target pose."""
  if target_pos is None and target_quat is None:
    raise ValueError(
        'at least one of target_pos or target_quat must be given')

  # accept either a Physics wrapper or a raw Model
  physics = None
  if isinstance(physics_or_model, types.Model):
    model = physics_or_model
  else:
    physics = physics_or_model
    model = physics.model

  site_id = model.names.name2id('site', site_name)
  fk = _fk_site(model, site_id)

  # dof column selection
  if joint_names is None:
    dof_mask = np.ones(model.nv, dtype=bool)
  else:
    dof_mask = np.zeros(model.nv, dtype=bool)
    for name in joint_names:
      j = model.names.name2id('joint', name)
      adr = model.jnt_dofadr[j]
      width = constants.DOF_WIDTH[
          constants.JointType(model.jnt_type[j])]
      dof_mask[adr:adr + width] = True

  if qpos0 is not None:
    qpos = np.array(qpos0, dtype=np.float64)
  elif physics is not None:
    qpos = np.array(physics.position(), dtype=np.float64)
  else:
    qpos = np.array(model.qpos0, dtype=np.float64)

  success = False
  steps = 0
  err_norm = np.inf

  for steps in range(1, max_steps + 1):
    pos, quat, jacp, jacr = fk(qpos)
    err_parts = []
    jac_parts = []
    err_norm = 0.0
    if target_pos is not None:
      err_pos = np.asarray(target_pos, dtype=np.float64) - pos
      err_norm += float(np.linalg.norm(err_pos))
      err_parts.append(err_pos)
      jac_parts.append(np.asarray(jacp, dtype=np.float64))
    if target_quat is not None:
      q = np.asarray(quat, dtype=np.float64)
      tq = np.asarray(target_quat, dtype=np.float64)
      # rotational error as 3-vector (world frame)
      neg = q * np.array([1.0, -1, -1, -1])
      w1, x1, y1, z1 = tq
      w2, x2, y2, z2 = neg
      dq = np.array([
          w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
          w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
          w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
          w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])
      sin_half = np.linalg.norm(dq[1:])
      angle = 2.0 * np.arctan2(sin_half, dq[0])
      if angle > np.pi:
        angle -= 2 * np.pi
      axis = dq[1:] / max(sin_half, 1e-12)
      # rot_weight scales the convergence metric only, NOT the
      # least-squares system (reference inverse_kinematics.py:160-174)
      err_rot = axis * angle
      err_norm += float(np.linalg.norm(err_rot)) * rot_weight
      err_parts.append(err_rot)
      jac_parts.append(np.asarray(jacr, dtype=np.float64))

    if err_norm < tol:
      success = True
      break

    err = np.concatenate(err_parts)
    jac = np.concatenate(jac_parts, axis=0)[:, dof_mask]

    # damped least squares
    reg = (regularization_strength
           if err_norm > regularization_threshold else 0.0)
    hess = jac.T @ jac + reg * np.eye(jac.shape[1])
    update = np.linalg.solve(hess, jac.T @ err)

    update_norm = np.linalg.norm(update)
    if update_norm > max_update_norm:
      update *= max_update_norm / update_norm
    # diminishing returns check
    progress = err_norm / max(update_norm, 1e-12)
    if progress > progress_thresh:
      break

    dq_full = np.zeros(model.nv)
    dq_full[dof_mask] = update
    qpos = _integrate_pos_np(model, qpos, dq_full)

  if success and inplace and physics is not None:
    physics.set_state(np.concatenate(
        [qpos, np.zeros(model.nv + model.na)]))
    physics.forward()

  return IKResult(qpos=qpos, err_norm=err_norm, steps=steps,
                  success=success)


def _integrate_pos_np(model: types.Model, qpos: np.ndarray,
                      dq: np.ndarray) -> np.ndarray:
  """Quaternion-aware qpos += dq (host-side)."""
  out = qpos.copy()
  for j in range(model.njnt):
    jt = constants.JointType(model.jnt_type[j])
    qa, va = model.jnt_qposadr[j], model.jnt_dofadr[j]
    if jt == constants.JointType.FREE:
      out[qa:qa + 3] += dq[va:va + 3]
      out[qa + 3:qa + 7] = _quat_integrate_np(
          qpos[qa + 3:qa + 7], dq[va + 3:va + 6])
    elif jt == constants.JointType.BALL:
      out[qa:qa + 4] = _quat_integrate_np(qpos[qa:qa + 4],
                                          dq[va:va + 3])
    else:
      out[qa] += dq[va]
  return out


def _quat_integrate_np(q, omega):
  angle = np.linalg.norm(omega)
  if angle < 1e-12:
    return q
  axis = omega / angle
  half = angle / 2
  dq = np.concatenate([[np.cos(half)], axis * np.sin(half)])
  w1, x1, y1, z1 = q
  w2, x2, y2, z2 = dq
  out = np.array([
      w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
      w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
      w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
      w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])
  return out / np.linalg.norm(out)
