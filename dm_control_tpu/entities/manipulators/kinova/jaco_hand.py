"""The Kinova Jaco 3-finger hand entity.

Behavioural counterpart of reference
dm_control/entities/manipulators/kinova/jaco_hand.py:33-170.
"""

from __future__ import annotations

import collections.abc
import os

from dm_control_tpu import composer
from dm_control_tpu import mjcf
from dm_control_tpu.composer import define
from dm_control_tpu.composer.observation import observable
from dm_control_tpu.entities.manipulators import base
from dm_control_tpu.entities.manipulators.kinova.jaco_arm import (
    KINOVA_ROOT)

_JACO_HAND_XML_PATH = os.path.join(KINOVA_ROOT, 'jaco_hand.xml')
_HAND_BODY = 'hand'
_PINCH_SITE = 'pinchsite'
_GRIP_SITE = 'gripsite'


class JacoHand(base.RobotHand):
  """A composer entity representing a Jaco hand."""

  def _build(self, name=None, use_pinch_site_as_tcp=False):
    self._mjcf_root = mjcf.from_path(_JACO_HAND_XML_PATH)
    if name:
      self._mjcf_root.model = name
    self._bodies = self.mjcf_model.find_all('body')
    self._tool_center_point = self._mjcf_root.find(
        'site', _PINCH_SITE if use_pinch_site_as_tcp else _GRIP_SITE)
    self._joints = self._mjcf_root.find_all('joint')
    self._hand_geoms = list(
        self._mjcf_root.find('body', _HAND_BODY).get_children('geom'))
    self._finger_geoms = [
        g for g in self._mjcf_root.find_all('geom')
        if g.name and g.name.startswith('finger')]
    self._grip_site = self._mjcf_root.find('site', _GRIP_SITE)
    self._pinch_site = self._mjcf_root.find('site', _PINCH_SITE)
    self._finger_actuators = [
        _add_velocity_actuator(joint) for joint in self._joints]

  def _build_observables(self):
    return JacoHandObservables(self)

  @property
  def tool_center_point(self):
    return self._tool_center_point

  @property
  def joints(self):
    return self._joints

  @property
  def actuators(self):
    return self._finger_actuators

  @property
  def hand_geom(self):
    return self._hand_geoms

  @property
  def finger_geoms(self):
    return self._finger_geoms

  @property
  def grip_site(self):
    return self._grip_site

  @property
  def pinch_site(self):
    return self._pinch_site

  @property
  def mjcf_model(self):
    return self._mjcf_root

  def set_grasp(self, physics, close_factors):
    """Sets finger positions: 0 = fully open, 1 = fully closed
    (reference jaco_hand.py:117-139)."""
    if not isinstance(close_factors, collections.abc.Iterable):
      close_factors = (close_factors,) * len(self.joints)
    for joint, finger_factor in zip(self.joints, close_factors):
      joint_mj = physics.bind(joint)
      min_value, max_value = joint_mj.range
      joint_mj.qpos = min_value + (max_value - min_value) * finger_factor
    physics.after_reset()
    physics.bind(self.actuators).ctrl = 0


def _add_velocity_actuator(joint):
  # tuned for ~25 N grip force and ~1.2 s closing time (datasheet)
  return joint.root.actuator.add(
      'velocity', joint=joint, name=joint.name, kv=10.,
      ctrllimited='true', ctrlrange=[-5., 5.],
      forcelimited='true', forcerange=[-1., 1.])


class JacoHandObservables(base.JointsObservables):
  """Observables for the Jaco hand."""

  @define.observable
  def pinch_site_pos(self):
    """The position of the pinch site, in global coordinates."""
    return observable.MJCFFeature('xpos', self._entity.pinch_site)

  @define.observable
  def pinch_site_rmat(self):
    """The rotation matrix of the pinch site in global coordinates."""
    return observable.MJCFFeature('xmat', self._entity.pinch_site)
