"""Tool-center-point initializer
(reference composer/initializers/tcp_initializer.py:31-170).

Places a robot arm's TCP (hand site or wrist site) at a sampled
Cartesian pose via the damped-least-squares IK solver, with rejection
sampling over colliding configurations.
"""

from __future__ import annotations

import numpy as np

from dm_control_tpu.composer import environment as env_lib
from dm_control_tpu.composer.variation import variation_values
from dm_control_tpu.utils import inverse_kinematics as ik

DOWN_QUATERNION = np.array([0.0, 0.70710678118, 0.70710678118, 0.0])


class ToolCenterPointInitializer:
  """Sets an arm's TCP pose via IK with collision rejection."""

  def __init__(self,
               hand,
               arm,
               position,
               quaternion=DOWN_QUATERNION,
               ignore_collisions=False,
               max_ik_attempts=10,
               max_rejection_samples=10):
    self._arm = arm
    self._hand = hand
    self._position = position
    self._quaternion = quaternion
    self._ignore_collisions = ignore_collisions
    self._max_ik_attempts = max_ik_attempts
    self._max_rejection_samples = max_rejection_samples

  def _tcp_site(self):
    if self._hand is not None:
      return self._hand.tool_center_point
    return self._arm.wrist_site

  def _arm_collides(self, physics):
    from dm_control_tpu.composer.initializers.prop_initializer import (
        _prop_geom_ids)
    gids = _prop_geom_ids(physics, self._arm)
    if self._hand is not None:
      gids |= _prop_geom_ids(physics, self._hand)
    con = physics.data.contact
    active = np.asarray(con.active)
    dist = np.asarray(con.dist)
    g1 = np.asarray(con.geom1)
    g2 = np.asarray(con.geom2)
    for i in np.nonzero(active)[0]:
      if dist[i] <= 0 and (int(g1[i]) in gids or int(g2[i]) in gids):
        return True
    return False

  def __call__(self, physics, random_state):
    site = self._tcp_site()
    site_name = site.full_identifier
    joints = self._arm.joints
    joint_names = [j.full_identifier for j in joints]
    jb = physics.bind(joints)
    jnt_range = np.asarray(jb.range)

    for _ in range(self._max_rejection_samples):
      target_pos = variation_values.evaluate(
          self._position, random_state=random_state)
      target_quat = variation_values.evaluate(
          self._quaternion, random_state=random_state)
      for attempt in range(self._max_ik_attempts):
        if attempt > 0:
          jb.qpos = random_state.uniform(jnt_range[:, 0],
                                         jnt_range[:, 1])
          physics.forward()
        result = ik.qpos_from_site_pose(
            physics, site_name, target_pos=np.asarray(target_pos),
            target_quat=(np.asarray(target_quat)
                         if target_quat is not None else None),
            joint_names=joint_names, inplace=True)
        if not result.success:
          continue
        physics.forward()
        if self._ignore_collisions or not self._arm_collides(physics):
          return
    raise env_lib.EpisodeInitializationError(
        'Failed to find a valid initial configuration for the robot '
        f'after {self._max_rejection_samples} TCP poses sampled and up '
        f'to {self._max_ik_attempts} initial joint configurations per '
        'pose.')
