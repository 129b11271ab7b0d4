"""The Kinova Jaco arm entity.

Behavioral contract: reference entities/manipulators/kinova/jaco_arm.py
— the vendored third_party MJCF model with firmware-limit velocity
actuators and per-joint torque sensors added programmatically. Here
the datasheet limits live in one per-joint-class spec table and the
actuator/sensor wiring is a single pass over it.
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

_VELOCITY_GAIN = 500.

# joint name -> (peak torque [Nm], firmware velocity cap [rad/s]);
# KA-75+ actuators drive joints 1-3, KA-58 joints 4-6 (datasheet)
_JOINT_SPEC = {
    **{name: (30.5, np.deg2rad(36.))
       for name in ('joint_1', 'joint_2', 'joint_3')},
    **{name: (6.8, np.deg2rad(48.))
       for name in ('joint_4', 'joint_5', 'joint_6')},
}


def _rig_joint(joint):
  """Adds the velocity actuator + torque sensor for one joint."""
  try:
    torque, velocity = _JOINT_SPEC[joint.name]
  except KeyError:
    raise ValueError(
        f'`joint.name` must be one of {tuple(_JOINT_SPEC)}, '
        f'got {joint.name!r}.') from None
  actuator = joint.root.actuator.add(
      'velocity', joint=joint, name=joint.name, kv=_VELOCITY_GAIN,
      ctrllimited='true', ctrlrange=[-velocity, velocity],
      forcelimited='true', forcerange=[-torque, torque])
  probe = joint.parent.add(
      'site', size=[1e-3], group=composer.SENSOR_SITES_GROUP,
      name=joint.name + '_site')
  sensor = joint.root.sensor.add('torque', site=probe,
                                 name=joint.name + '_torque')
  return actuator, sensor


class JacoArm(base.RobotArm):
  """A composer entity representing a Jaco arm."""

  def _build(self, name=None):
    self._mjcf_root = mjcf.from_path(
        os.path.join(KINOVA_ROOT, 'jaco_arm.xml'))
    if name:
      self._mjcf_root.model = name
    self._joints = [self._mjcf_root.find('joint', n)
                    for n in _JOINT_SPEC]
    self._wrist_site = self._mjcf_root.find('site', 'wristsite')
    self._bodies = self.mjcf_model.find_all('body')
    rig = [_rig_joint(j) for j in self._joints]
    self._actuators = [a for a, _ in rig]
    self._joint_torque_sensors = [s for _, s in rig]

  def _build_observables(self):
    return JacoArmObservables(self)

  joints = property(lambda self: self._joints)
  actuators = property(lambda self: self._actuators)
  joint_torque_sensors = property(
      lambda self: self._joint_torque_sensors)
  wrist_site = property(lambda self: self._wrist_site)
  mjcf_model = property(lambda self: self._mjcf_root)


class JacoArmObservables(base.JointsObservables):
  """Jaco arm observables."""

  @define.observable
  def joints_pos(self):
    # most Jaco joints spin freely: report (sin, cos) pairs so the
    # observation stays bounded (reference jaco_arm.py:137-144)
    def bounded_angles(physics):
      q = np.asarray(physics.bind(self._entity.joints).qpos)
      return np.stack([np.sin(q), np.cos(q)], axis=-1)
    return observable.Generic(bounded_angles)

  @define.observable
  def joints_torque(self):
    # each 3-axis torque reading projected onto its joint axis
    def axial_torques(physics):
      readings = np.asarray(physics.bind(
          self._entity.joint_torque_sensors).sensordata).reshape(-1, 3)
      axes = np.asarray(physics.bind(self._entity.joints).axis)
      return np.sum(readings * axes, axis=-1)
    return observable.Generic(axial_torques)
