"""The Kinova Jaco arm entity.

Behavioural counterpart of reference
dm_control/entities/manipulators/kinova/jaco_arm.py:50-154: the vendored
third_party MJCF model with velocity actuators (datasheet torque/
velocity limits) and per-joint torque sensors added programmatically.
"""

from __future__ import annotations

import os

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu import mjcf
from dm_control_tpu.composer import define
from dm_control_tpu.composer.observation import observable
from dm_control_tpu.entities.manipulators import base

KINOVA_ROOT = os.path.normpath(os.path.join(
    os.path.dirname(__file__), '..', '..', '..', 'third_party', 'kinova'))
_JACO_ARM_XML_PATH = os.path.join(KINOVA_ROOT, 'jaco_arm.xml')
_LARGE_JOINTS = ('joint_1', 'joint_2', 'joint_3')
_SMALL_JOINTS = ('joint_4', 'joint_5', 'joint_6')
_ALL_JOINTS = _LARGE_JOINTS + _SMALL_JOINTS
_WRIST_SITE = 'wristsite'

# peak torque limits from Kinova's KA-75+/KA-58 datasheet
_LARGE_JOINT_MAX_TORQUE = 30.5
_SMALL_JOINT_MAX_TORQUE = 6.8
# firmware-imposed velocity limits
_LARGE_JOINT_MAX_VELOCITY = np.deg2rad(36.)
_SMALL_JOINT_MAX_VELOCITY = np.deg2rad(48.)
_VELOCITY_GAIN = 500.


class JacoArm(base.RobotArm):
  """A composer entity representing a Jaco arm."""

  def _build(self, name=None):
    self._mjcf_root = mjcf.from_path(_JACO_ARM_XML_PATH)
    if name:
      self._mjcf_root.model = name
    self._joints = [self._mjcf_root.find('joint', n)
                    for n in _ALL_JOINTS]
    self._wrist_site = self._mjcf_root.find('site', _WRIST_SITE)
    self._bodies = self.mjcf_model.find_all('body')
    self._actuators = [_add_velocity_actuator(j) for j in self._joints]
    self._joint_torque_sensors = [
        _add_torque_sensor(j) for j in self._joints]

  def _build_observables(self):
    return JacoArmObservables(self)

  @property
  def joints(self):
    return self._joints

  @property
  def actuators(self):
    return self._actuators

  @property
  def joint_torque_sensors(self):
    return self._joint_torque_sensors

  @property
  def wrist_site(self):
    return self._wrist_site

  @property
  def mjcf_model(self):
    return self._mjcf_root


def _add_velocity_actuator(joint):
  if joint.name in _LARGE_JOINTS:
    max_torque = _LARGE_JOINT_MAX_TORQUE
    max_velocity = _LARGE_JOINT_MAX_VELOCITY
  elif joint.name in _SMALL_JOINTS:
    max_torque = _SMALL_JOINT_MAX_TORQUE
    max_velocity = _SMALL_JOINT_MAX_VELOCITY
  else:
    raise ValueError(f'`joint.name` must be one of {_ALL_JOINTS}, '
                     f'got {joint.name!r}.')
  return joint.root.actuator.add(
      'velocity', joint=joint, name=joint.name, kv=_VELOCITY_GAIN,
      ctrllimited='true', ctrlrange=[-max_velocity, max_velocity],
      forcelimited='true', forcerange=[-max_torque, max_torque])


def _add_torque_sensor(joint):
  site = joint.parent.add(
      'site', size=[1e-3], group=composer.SENSOR_SITES_GROUP,
      name=joint.name + '_site')
  return joint.root.sensor.add('torque', site=site,
                               name=joint.name + '_torque')


class JacoArmObservables(base.JointsObservables):
  """Jaco arm observables."""

  @define.observable
  def joints_pos(self):
    # most Jaco joints are unlimited: report sin/cos pairs so the
    # observation stays bounded (reference jaco_arm.py:137-144)
    def get_sin_cos_joint_angles(physics):
      joint_pos = np.asarray(physics.bind(self._entity.joints).qpos)
      return np.vstack([np.sin(joint_pos), np.cos(joint_pos)]).T
    return observable.Generic(get_sin_cos_joint_angles)

  @define.observable
  def joints_torque(self):
    # project the 3-axis torque sensor readings onto each joint axis
    def get_torques(physics):
      torques = np.asarray(physics.bind(
          self._entity.joint_torque_sensors).sensordata)
      joint_axes = np.asarray(physics.bind(self._entity.joints).axis)
      return np.einsum('ij,ij->i', torques.reshape(-1, 3), joint_axes)
    return observable.Generic(get_torques)
