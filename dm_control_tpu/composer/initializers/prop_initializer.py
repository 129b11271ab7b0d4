"""Prop placement with collision rejection
(reference composer/initializers/prop_initializer.py:52-285).

TPU adaptation: contact candidate pairs are compile-time constants, so
instead of the reference's temporary contype/conaffinity zeroing, a
pose is rejected when any penetrating contact involves the prop's
geoms (the contact buffer is soft top-K, so there is no buffer-full
PhysicsError path to handle).
"""

from __future__ import annotations

import numpy as np

from dm_control_tpu.composer import environment as env_lib
from dm_control_tpu.composer.variation import variation_values

_SETTLE_QVEL_TOL = 1e-3
_SETTLE_QACC_TOL = 1e-2

IDENTITY_QUATERNION = np.array([1.0, 0.0, 0.0, 0.0])


def _prop_geom_ids(physics, prop):
  """Compiled geom ids of one prop's geoms."""
  from dm_control_tpu.mjcf import physics as mjcf_physics
  root = physics.mjcf_model
  all_geoms = mjcf_physics._doc_order_elements(root, 'geom')
  prop_geoms = set(map(id, prop.mjcf_model.find_all('geom')))
  return {i for i, g in enumerate(all_geoms) if id(g) in prop_geoms}


# qpos/qvel widths per joint type id (free, ball, slide, hinge)
_JOINT_WIDTHS = {0: (7, 6), 1: (4, 3), 2: (1, 1), 3: (1, 1)}


def _prop_state_addresses(physics, props):
  """(qpos_addrs, dof_addrs) covered by the props' joints, including
  the freejoints that live on their attachment frames."""
  from dm_control_tpu import mjcf
  from dm_control_tpu.mjcf import physics as mjcf_physics
  own = set()
  for prop in props:
    own.update(map(id, prop.mjcf_model.find_all('joint')))
    frame = mjcf.get_attachment_frame(prop.mjcf_model)
    if frame is not None:
      own.update(map(id, frame.get_children('freejoint')))
  all_joints = mjcf_physics._doc_order_elements(
      physics.mjcf_model, 'joint')
  model = physics.model
  qpos_addrs, dof_addrs = [], []
  for j, joint in enumerate(all_joints):
    if id(joint) in own:
      nq, nv = _JOINT_WIDTHS[int(model.jnt_type[j])]
      qpos_addrs.extend(range(int(model.jnt_qposadr[j]),
                              int(model.jnt_qposadr[j]) + nq))
      dof_addrs.extend(range(int(model.jnt_dofadr[j]),
                             int(model.jnt_dofadr[j]) + nv))
  return np.asarray(qpos_addrs, dtype=int), np.asarray(dof_addrs, dtype=int)


class _FreezeOthers:
  """Pins every non-prop joint to its current state across steps.

  TPU-native stand-in for the reference's JointStaticIsolator
  (composer/initializers/utils.py:29-64): snapshot non-prop qpos/qvel
  once, write them back after each settle step."""

  def __init__(self, physics, props):
    prop_q, prop_d = _prop_state_addresses(physics, props)
    nq = physics.model.nq
    nv = physics.model.nv
    self._q_idx = np.setdiff1d(np.arange(nq), prop_q)
    self._d_idx = np.setdiff1d(np.arange(nv), prop_d)
    self._prop_dofs = prop_d
    self._qpos0 = physics.position()[self._q_idx]
    self._qvel0 = physics.velocity()[self._d_idx]

  @property
  def prop_dofs(self):
    return self._prop_dofs

  def restore(self, physics):
    if self._q_idx.size:
      qpos = physics.position()
      qvel = physics.velocity()
      qpos[self._q_idx] = self._qpos0
      qvel[self._d_idx] = self._qvel0
      physics._set_field('data', 'qpos', qpos)
      physics._set_field('data', 'qvel', qvel)


class PropPlacer:
  """Places props at sampled poses, rejecting colliding ones."""

  def __init__(self,
               props,
               position,
               quaternion=IDENTITY_QUATERNION,
               ignore_collisions=False,
               max_qvel_tol=_SETTLE_QVEL_TOL,
               max_qacc_tol=_SETTLE_QACC_TOL,
               max_attempts_per_prop=20,
               settle_physics=False,
               max_settle_physics_time=2.0):
    self._props = list(props)
    self._position = position
    self._quaternion = quaternion
    self._ignore_collisions = ignore_collisions
    self._max_attempts_per_prop = max_attempts_per_prop
    self._settle_physics = settle_physics
    self._max_qvel_tol = max_qvel_tol
    self._max_qacc_tol = max_qacc_tol
    self._max_settle_physics_time = max_settle_physics_time

  def _has_collisions_with_prop(self, physics, gids, ignored_gids):
    """True if any penetrating contact couples `gids` to a
    non-ignored geom. The reference achieves the same by zeroing
    contype/conaffinity on not-yet-placed props; here contact pairs
    are compile-time constants, so filtering happens at read time."""
    con = physics.data.contact
    active = np.asarray(con.active)
    dist = np.asarray(con.dist)
    g1 = np.asarray(con.geom1)
    g2 = np.asarray(con.geom2)
    for i in np.nonzero(active)[0]:
      if dist[i] > 0:
        continue
      a, b = int(g1[i]), int(g2[i])
      if a in gids:
        other = b
      elif b in gids:
        other = a
      else:
        continue
      if other not in ignored_gids:
        return True
    return False

  def __call__(self, physics, random_state,
               ignore_contacts_with_entities=None):
    prop_gids = [_prop_geom_ids(physics, prop) for prop in self._props]
    always_ignored = set()
    for entity in (ignore_contacts_with_entities or ()):
      always_ignored |= _prop_geom_ids(physics, entity)
    # while placing prop i, contacts with not-yet-placed props are
    # spurious (they still sit at their default pose)
    pending = [set().union(*prop_gids[i + 1:]) if i + 1 < len(prop_gids)
               else set() for i in range(len(prop_gids))]
    for prop_index, prop in enumerate(self._props):
      success = False
      initial_position, initial_quaternion = prop.get_pose(physics)
      next_position, next_quaternion = (initial_position,
                                        initial_quaternion)
      for _ in range(self._max_attempts_per_prop):
        next_position = variation_values.evaluate(
            self._position, initial_value=initial_position,
            current_value=next_position, random_state=random_state)
        next_quaternion = variation_values.evaluate(
            self._quaternion, initial_value=initial_quaternion,
            current_value=next_quaternion, random_state=random_state)
        prop.set_pose(physics, next_position, next_quaternion)
        physics.forward()
        if (self._ignore_collisions or
            not self._has_collisions_with_prop(
                physics, prop_gids[prop_index],
                always_ignored | pending[prop_index])):
          success = True
          break
      if not success:
        raise env_lib.EpisodeInitializationError(
            f'Failed to find a non-colliding pose for prop '
            f'{prop.mjcf_model.model!r} within '
            f'{self._max_attempts_per_prop} attempts.')

    if self._settle_physics and self._props:
      # let the props fall to rest while every other joint (robot,
      # etc.) stays pinned, as in the reference place_and_settle
      freezer = _FreezeOthers(physics, self._props)
      dt = float(physics.model.opt.timestep)
      t0 = physics.time()
      max_steps = int(self._max_settle_physics_time / dt)
      dofs = freezer.prop_dofs
      for _ in range(max_steps):
        physics.step()
        qvel = np.abs(np.asarray(physics.data.qvel)[dofs])
        qacc = np.abs(np.asarray(physics.data.qacc)[dofs])
        freezer.restore(physics)
        if (qvel.max(initial=0) < self._max_qvel_tol and
            qacc.max(initial=0) < self._max_qacc_tol):
          break
      physics._set_field('data', 'time', np.float32(t0))
      physics.forward()
