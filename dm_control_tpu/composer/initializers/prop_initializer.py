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

  def _has_collisions_with_prop(self, physics, prop):
    gids = _prop_geom_ids(physics, prop)
    con = physics.data.contact
    active = np.asarray(con.active)
    dist = np.asarray(con.dist)
    g1 = np.asarray(con.geom1)
    g2 = np.asarray(con.geom2)
    for i in np.nonzero(active)[0]:
      if dist[i] <= 0 and (int(g1[i]) in gids or int(g2[i]) in gids):
        return True
    return False

  def __call__(self, physics, random_state,
               ignore_contacts_with_entities=None):
    del ignore_contacts_with_entities  # no contact disabling needed
    for prop in self._props:
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
            not self._has_collisions_with_prop(physics, prop)):
          success = True
          break
      if not success:
        raise env_lib.EpisodeInitializationError(
            f'Failed to find a non-colliding pose for prop '
            f'{prop.mjcf_model.model!r} within '
            f'{self._max_attempts_per_prop} attempts.')

    if self._settle_physics and self._props:
      dt = float(physics.model.opt.timestep)
      max_steps = int(self._max_settle_physics_time / dt)
      for _ in range(max_steps):
        physics.step()
        qvel = np.abs(np.asarray(physics.data.qvel))
        qacc = np.abs(np.asarray(physics.data.qacc))
        if (qvel.max(initial=0) < self._max_qvel_tol and
            qacc.max(initial=0) < self._max_qacc_tol):
          break
