"""The Kinova Jaco 3-finger hand entity.

Behavioral contract: reference entities/manipulators/kinova/
jaco_hand.py — the vendored MJCF model with velocity-actuated fingers,
grip/pinch sites, and a normalized `set_grasp`. Element lookups are
grouped into one discovery pass; the grasp write is vectorized.
"""

from __future__ import annotations

import os

import numpy as np

from dm_control_tpu import mjcf
from dm_control_tpu.composer import define
from dm_control_tpu.composer.observation import observable
from dm_control_tpu.entities.manipulators import base
from dm_control_tpu.entities.manipulators.kinova.jaco_arm import (
    KINOVA_ROOT)

# tuned for ~25 N grip force and ~1.2 s closing time (datasheet)
_FINGER_KV = 10.
_FINGER_CTRL_RANGE = (-5., 5.)
_FINGER_FORCE_RANGE = (-1., 1.)


class JacoHand(base.RobotHand):
  """A composer entity representing a Jaco hand."""

  def _build(self, name=None, use_pinch_site_as_tcp=False):
    root = mjcf.from_path(os.path.join(KINOVA_ROOT, 'jaco_hand.xml'))
    self._mjcf_root = root
    if name:
      root.model = name
    self._bodies = root.find_all('body')
    self._joints = root.find_all('joint')
    self._grip_site = root.find('site', 'gripsite')
    self._pinch_site = root.find('site', 'pinchsite')
    self._tool_center_point = (
        self._pinch_site if use_pinch_site_as_tcp else self._grip_site)
    self._hand_geoms = list(
        root.find('body', 'hand').get_children('geom'))
    self._finger_geoms = [g for g in root.find_all('geom')
                          if (g.name or '').startswith('finger')]
    self._finger_actuators = [
        joint.root.actuator.add(
            'velocity', joint=joint, name=joint.name, kv=_FINGER_KV,
            ctrllimited='true', ctrlrange=list(_FINGER_CTRL_RANGE),
            forcelimited='true', forcerange=list(_FINGER_FORCE_RANGE))
        for joint in self._joints]

  def _build_observables(self):
    return JacoHandObservables(self)

  tool_center_point = property(lambda self: self._tool_center_point)
  joints = property(lambda self: self._joints)
  actuators = property(lambda self: self._finger_actuators)
  hand_geom = property(lambda self: self._hand_geoms)
  finger_geoms = property(lambda self: self._finger_geoms)
  grip_site = property(lambda self: self._grip_site)
  pinch_site = property(lambda self: self._pinch_site)
  mjcf_model = property(lambda self: self._mjcf_root)

  def set_grasp(self, physics, close_factors):
    """Drives fingers to a fraction of their range: 0 = open, 1 =
    closed. Accepts a scalar (all fingers) or one value per finger."""
    fractions = np.broadcast_to(np.asarray(close_factors, dtype=float),
                                (len(self._joints),))
    binding = physics.bind(self._joints)
    low, high = np.asarray(binding.range).T
    binding.qpos = low + (high - low) * fractions
    physics.after_reset()
    physics.bind(self._finger_actuators).ctrl = 0


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
