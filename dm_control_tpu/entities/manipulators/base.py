"""Abstract base classes for robot arms and hands.

Behavioural counterpart of reference
dm_control/entities/manipulators/base.py:36-196: joint sampling bounds,
arm randomization, IK-driven site placement, and the shared joint
observables.
"""

from __future__ import annotations

import abc

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu import mjcf
from dm_control_tpu.composer import define
from dm_control_tpu.composer.observation import observable
from dm_control_tpu.models import constants
from dm_control_tpu.utils import inverse_kinematics

DOWN_QUATERNION = np.array([0., 0.70710678118, 0.70710678118, 0.])

_INVALID_JOINTS_ERROR = (
    'All non-hinge joints must have limits. Model contains the following '
    'non-hinge joints which are unbounded:\n{invalid_str}')


class RobotArm(composer.Robot, metaclass=abc.ABCMeta):
  """The abstract base class for robotic arms."""

  def _build_observables(self):
    return JointsObservables(self)

  @property
  def attachment_site(self):
    return self.wrist_site

  def _get_joint_pos_sampling_bounds(self, physics):
    """(2, num_joints) lower/upper position bounds; unlimited hinges
    sample [0, 2pi] (reference base.py:60-84)."""
    bound_joints = physics.bind(self.joints)
    limits = np.array(bound_joints.range, copy=True)
    m = physics.model
    jids = [m.names.name2id('joint', j.full_identifier)
            for j in self.joints]
    is_hinge = np.array([m.jnt_type[j] == constants.JointType.HINGE
                         for j in jids])
    is_limited = np.array([bool(m.jnt_limited[j]) for j in jids])
    invalid = ~is_hinge & ~is_limited
    if np.any(invalid):
      invalid_str = '\n'.join(
          str(self.joints[i]) for i in np.where(invalid)[0])
      raise RuntimeError(
          _INVALID_JOINTS_ERROR.format(invalid_str=invalid_str))
    limits[is_hinge & ~is_limited] = 0., 2 * np.pi
    return limits.T

  def randomize_arm_joints(self, physics, random_state):
    """Randomizes the qpos of all arm joints within bounds."""
    lower, upper = self._get_joint_pos_sampling_bounds(physics)
    physics.bind(self.joints).qpos = random_state.uniform(lower, upper)

  def set_site_to_xpos(self, physics, random_state, site, target_pos,
                       target_quat=None, max_ik_attempts=10):
    """IK-drives the arm so `site` reaches `target_pos` (/`target_quat`,
    default pointing down). Retries with randomized joints
    (reference base.py:86-166). Returns success."""
    if isinstance(site, mjcf.Element):
      site_name = site.full_identifier
    elif isinstance(site, str):
      site_name = site
    else:
      raise ValueError(
          f'site should either be a string or mjcf.Element: got {site}')
    if target_quat is None:
      target_quat = DOWN_QUATERNION
    lower, upper = self._get_joint_pos_sampling_bounds(physics)
    arm_joint_names = [j.full_identifier for j in self.joints]

    for _ in range(max_ik_attempts):
      result = inverse_kinematics.qpos_from_site_pose(
          physics,
          site_name=site_name,
          target_pos=target_pos,
          target_quat=target_quat,
          joint_names=arm_joint_names,
          rot_weight=2,
          inplace=True)
      success = result.success

      # canonicalize angles into [low, high)
      if success:
        for arm_joint, low, high in zip(self.joints, lower, upper):
          arm_joint_mj = physics.bind(arm_joint)
          while arm_joint_mj.qpos >= high:
            arm_joint_mj.qpos -= 2 * np.pi
          while arm_joint_mj.qpos < low:
            arm_joint_mj.qpos += 2 * np.pi
            if arm_joint_mj.qpos > high:
              success = False
              break

      if success or max_ik_attempts <= 1:
        break
      else:
        self.randomize_arm_joints(physics, random_state)

    return success

  @property
  @abc.abstractmethod
  def joints(self):
    """Returns the joint elements of the arm."""
    raise NotImplementedError

  @property
  @abc.abstractmethod
  def wrist_site(self):
    """Returns the wrist site element of the arm."""
    raise NotImplementedError


class JointsObservables(composer.Observables):
  """Observables common to all robot arms."""

  @define.observable
  def joints_pos(self):
    return observable.MJCFFeature('qpos', self._entity.joints)

  @define.observable
  def joints_vel(self):
    return observable.MJCFFeature('qvel', self._entity.joints)


class RobotHand(composer.Robot, metaclass=abc.ABCMeta):
  """The abstract base class for robotic hands."""

  @abc.abstractmethod
  def set_grasp(self, physics, close_factors):
    """Sets finger positions: 0 = fully open, 1 = fully closed."""

  @property
  @abc.abstractmethod
  def tool_center_point(self):
    """Returns the tool center point element of the hand."""
