"""Abstract base classes for robot arms and hands.

Behavioral contract: reference entities/manipulators/base.py — joint
sampling bounds, arm randomization, IK-driven site placement with
retry, and the shared joint observables. The per-joint while-loop
angle canonicalization is replaced by a vectorized modular wrap, and
the bounds/wrap math lives in module functions usable outside the
class hierarchy.
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

_TWO_PI = 2 * np.pi


def joint_sampling_bounds(physics, joints):
  """(lower, upper) qpos sampling bounds for a joint list.

  Unlimited hinges sample the full circle [0, 2pi); any other
  unlimited joint type has no bounded sampling range and is an error.
  """
  binding = physics.bind(joints)
  lower, upper = np.array(binding.range, copy=True).T
  model = physics.model
  jids = np.array([model.names.name2id('joint', j.full_identifier)
                   for j in joints])
  hinge = np.array([int(model.jnt_type[j]) == constants.JointType.HINGE
                    for j in jids])
  limited = np.array([bool(model.jnt_limited[j]) for j in jids])
  unbounded = ~hinge & ~limited
  if unbounded.any():
    offenders = '\n'.join(
        str(joints[i]) for i in np.flatnonzero(unbounded))
    raise RuntimeError(
        'All non-hinge joints must have limits. Model contains the '
        f'following non-hinge joints which are unbounded:\n{offenders}')
  free_spin = hinge & ~limited
  lower[free_spin], upper[free_spin] = 0., _TWO_PI
  return lower, upper


def wrap_into_bounds(qpos, lower, upper):
  """Wraps angles into [lower, lower + 2pi); returns (wrapped, ok)
  where ok is True iff every wrapped angle also respects `upper`."""
  wrapped = lower + np.mod(np.asarray(qpos) - lower, _TWO_PI)
  return wrapped, bool(np.all(wrapped <= upper))


def _site_identifier(site):
  if isinstance(site, mjcf.Element):
    return site.full_identifier
  if isinstance(site, str):
    return site
  raise ValueError(
      f'site should either be a string or mjcf.Element: got {site}')


class RobotArm(composer.Robot, metaclass=abc.ABCMeta):
  """The abstract base class for robotic arms."""

  def _build_observables(self):
    return JointsObservables(self)

  @property
  def attachment_site(self):
    return self.wrist_site

  def randomize_arm_joints(self, physics, random_state):
    """Draws a uniform qpos for every arm joint within its bounds."""
    lower, upper = joint_sampling_bounds(physics, self.joints)
    physics.bind(self.joints).qpos = random_state.uniform(lower, upper)

  def set_site_to_xpos(self, physics, random_state, site, target_pos,
                       target_quat=None, max_ik_attempts=10):
    """Solves IK so `site` lands at `target_pos` (and `target_quat`,
    default pointing straight down); re-seeds from random joints on
    failure. Returns True on success."""
    site_name = _site_identifier(site)
    lower, upper = joint_sampling_bounds(physics, self.joints)
    joint_names = [j.full_identifier for j in self.joints]
    if target_quat is None:
      target_quat = DOWN_QUATERNION

    for attempt in range(max_ik_attempts):
      result = inverse_kinematics.qpos_from_site_pose(
          physics, site_name=site_name, target_pos=target_pos,
          target_quat=target_quat, joint_names=joint_names,
          rot_weight=2, inplace=True)
      if result.success:
        binding = physics.bind(self.joints)
        # the IK solution stands only if the canonicalized angles
        # still respect the joint limits
        wrapped, ok = wrap_into_bounds(binding.qpos, lower, upper)
        if ok:
          binding.qpos = wrapped
          return True
      if attempt + 1 < max_ik_attempts:
        self.randomize_arm_joints(physics, random_state)
    return False

  @property
  @abc.abstractmethod
  def joints(self):
    """The joint elements of the arm."""

  @property
  @abc.abstractmethod
  def wrist_site(self):
    """The wrist site element (doubles as the attachment site)."""


class JointsObservables(composer.Observables):
  """Joint-state observables common to all robot arms."""

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
    """The tool center point element of the hand."""
