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
    """Relevant collisions (reference tcp_initializer.py:89-125):
    arm-arm, arm-hand (NOT hand-hand: the Jaco fingers overlap the palm
    by design), and robot vs external bodies without free joints."""
    from dm_control_tpu.composer.initializers.prop_initializer import (
        _prop_geom_ids)
    from dm_control_tpu.models import constants as mconst
    arm_gids = _prop_geom_ids(physics, self._arm)
    hand_gids = (_prop_geom_ids(physics, self._hand)
                 if self._hand is not None else set())
    m = physics.model
    free_roots = {m.jnt_bodyid[j] for j in range(m.njnt)
                  if m.jnt_type[j] == mconst.JointType.FREE}

    def on_free_body(g):
      return m.body_rootid[m.geom_bodyid[g]] in free_roots or any(
          m.jnt_type[j] == mconst.JointType.FREE and
          m.jnt_bodyid[j] == m.geom_bodyid[g] for j in range(m.njnt))

    con = physics.data.contact
    active = np.asarray(con.active)
    dist = np.asarray(con.dist)
    g1s = np.asarray(con.geom1)
    g2s = np.asarray(con.geom2)
    for i in np.nonzero(active)[0]:
      if dist[i] > 0:
        continue
      g1, g2 = int(g1s[i]), int(g2s[i])
      in_arm1, in_arm2 = g1 in arm_gids, g2 in arm_gids
      in_hand1, in_hand2 = g1 in hand_gids, g2 in hand_gids
      robot1, robot2 = in_arm1 or in_hand1, in_arm2 or in_hand2
      if (in_arm1 and in_arm2) or (in_arm1 and in_hand2) or (
          in_hand1 and in_arm2):
        return True
      if ((robot1 and not robot2 and not on_free_body(g2)) or
          (robot2 and not robot1 and not on_free_body(g1))):
        return True
    return False

  def __call__(self, physics, random_state):
    site = self._tcp_site()
    initial_qpos = np.array(physics.bind(self._arm.joints).qpos)

    for _ in range(self._max_rejection_samples):
      target_pos = variation_values.evaluate(
          self._position, random_state=random_state)
      target_quat = variation_values.evaluate(
          self._quaternion, random_state=random_state)
      if hasattr(self._arm, 'set_site_to_xpos'):
        # RobotArm: IK + joint randomization with proper sampling
        # bounds (unlimited hinges sample [0, 2pi])
        success = self._arm.set_site_to_xpos(
            physics=physics, random_state=random_state, site=site,
            target_pos=np.asarray(target_pos),
            target_quat=(np.asarray(target_quat)
                         if target_quat is not None else None),
            max_ik_attempts=self._max_ik_attempts)
      else:
        result = ik.qpos_from_site_pose(
            physics, site.full_identifier,
            target_pos=np.asarray(target_pos),
            target_quat=(np.asarray(target_quat)
                         if target_quat is not None else None),
            joint_names=[j.full_identifier
                         for j in self._arm.joints],
            inplace=True)
        success = result.success
      if success:
        physics.forward()  # recalculate contacts
        if self._ignore_collisions or not self._arm_collides(physics):
          return
      # reset and try a fresh target
      physics.bind(self._arm.joints).qpos = initial_qpos
      physics.forward()
    raise env_lib.EpisodeInitializationError(
        'Failed to find a valid initial configuration for the robot '
        f'after {self._max_rejection_samples} TCP poses sampled and up '
        f'to {self._max_ik_attempts} initial joint configurations per '
        'pose.')
