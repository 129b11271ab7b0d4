"""A quadruped "ant" walker (reference locomotion/walkers/ant.py).

The model is generated programmatically: a spherical torso with four
2-dof legs (hip about z, diagonal ankle), motor actuators, imu + touch
sensors — morphologically equivalent to the reference third_party ant.
"""

from __future__ import annotations

import collections

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu import mjcf
from dm_control_tpu.composer.observation import observable
from dm_control_tpu.locomotion.walkers import base

_LEGS = {
    'front_left': (1, 1),
    'front_right': (1, -1),
    'back_right': (-1, -1),
    'back_left': (-1, 1),
}
_HIP_RANGE = (-0.52359, 0.52359)
_ANKLE_RANGE = (-0.34906, 0.34906)


class Ant(base.Walker):
  """A four-legged 8-dof sprawling walker."""

  def _build(self, name='walker', initializer=None):
    del initializer
    root = mjcf.RootElement(model=name)
    root.compiler.angle = 'radian'
    d = root.default
    jd = d.add('joint', limited='true', armature=1.0, damping=1.0,
               stiffness=1.0, solreflimit=[.04, 1],
               solimplimit=[0, .8, .03])
    gd = d.add('geom', friction=[1, 0.5, 0.5], solref=[.02, 1],
               solimp=[0, .8, .01], density=50.0)
    md = d.add('motor', ctrlrange=[-1.0, 1.0], ctrllimited='true',
               gear=[75])
    del jd, gd, md

    torso = root.worldbody.add('body', name='torso', pos=[0, 0, 0.522])
    self._root_body = torso
    torso.add('geom', name='torso_geom', type='sphere', size=[0.25],
              density=100.0)
    torso.add('site', name='torso_site', size=[0.05])
    torso.add('site', name='torso_touch', type='box',
              size=[0.26, 0.26, 0.26], group=4)
    root.worldbody.add(
        'camera', name='egocentric', pos=[.25, 0, .11],
        xyaxes=[0, -1, 0, 0, 0, 1], fovy=90.0)

    self._joints = []
    self._end_effectors = []
    for leg, (sx, sy) in _LEGS.items():
      leg_body = torso.add('body', name=f'{leg}_leg')
      leg_body.add('geom', name=f'{leg}_aux_geom', type='capsule',
                   size=[0.08],
                   fromto=[0, 0, 0, 0.2 * sx, 0.2 * sy, 0])
      aux = leg_body.add('body', name=f'{leg}_aux',
                         pos=[0.2 * sx, 0.2 * sy, 0])
      hip = aux.add('joint', name=f'{leg}_hip', type='hinge',
                    axis=[0, 0, 1], range=list(_HIP_RANGE))
      aux.add('geom', name=f'{leg}_leg_geom', type='capsule',
              size=[0.08], fromto=[0, 0, 0, 0.2 * sx, 0.2 * sy, 0])
      # foot tilted 39 degrees downward about the leg's transverse axis
      tilt = 0.3398 * 2  # half-angle encoded in the quaternion below
      qw = 0.9848077530122080
      qs = 0.3342815810509768
      foot = aux.add('body', name=f'{leg}_foot',
                     pos=[0.2 * sx, 0.2 * sy, 0],
                     quat=[qw, -qs * sy, qs * sx, 0])
      # diagonal ankle axes (perpendicular to the leg direction)
      ankle_axis = {'front_left': [1, -1, 0],
                    'front_right': [-1, -1, 0],
                    'back_right': [-1, 1, 0],
                    'back_left': [1, 1, 0]}[leg]
      ankle = foot.add('joint', name=f'{leg}_ankle', type='hinge',
                       axis=ankle_axis, range=list(_ANKLE_RANGE))
      ankle_geom = foot.add(
          'geom', name=f'{leg}_ankle_geom', type='capsule', size=[0.08],
          fromto=[0, 0, 0, 0.4 * sx, 0.4 * sy, 0])
      foot.add('site', name=f'{leg}_touch', type='box',
               pos=[0.2 * sx, 0.2 * sy, 0], size=[0.1, 0.1, 0.45],
               zaxis=[0.2 * sx, 0.2 * sy, 0], group=4)
      self._joints.extend([hip, ankle])
      self._end_effectors.append(ankle_geom)
      root.actuator.add('motor', name=f'{leg}_hip',
                        joint=f'{leg}_hip')
      root.actuator.add('motor', name=f'{leg}_ankle',
                        joint=f'{leg}_ankle')

    root.sensor.add('velocimeter', name='torso_vel', site='torso_site')
    root.sensor.add('gyro', name='torso_gyro', site='torso_site')
    root.sensor.add('accelerometer', name='torso_accel',
                    site='torso_site')
    for leg in _LEGS:
      root.sensor.add('touch', name=f'{leg}_touch', site=f'{leg}_touch')

    self._mjcf_root = root

  @property
  def mjcf_model(self):
    return self._mjcf_root

  @property
  def root_body(self):
    return self._root_body

  @property
  def observable_joints(self):
    return list(self._joints)

  @property
  def end_effectors(self):
    return tuple(self._end_effectors)

  @property
  def ground_contact_geoms(self):
    return tuple(self._end_effectors)

  def _build_observables(self):
    return AntObservables(self)


class AntObservables(base.WalkerObservables):

  @composer.observable
  def sensors_velocimeter(self):
    return observable.MJCFFeature(
        'sensordata',
        self._entity.mjcf_model.find('sensor', 'torso_vel'))

  @composer.observable
  def sensors_gyro(self):
    return observable.MJCFFeature(
        'sensordata',
        self._entity.mjcf_model.find('sensor', 'torso_gyro'))

  @composer.observable
  def sensors_accelerometer(self):
    return observable.MJCFFeature(
        'sensordata',
        self._entity.mjcf_model.find('sensor', 'torso_accel'))

  @composer.observable
  def sensors_touch(self):
    sensors = [self._entity.mjcf_model.find('sensor', f'{leg}_touch')
               for leg in _LEGS]
    return observable.MJCFFeature('sensordata', sensors)

  @property
  def kinematic_sensors(self):
    return [self.sensors_velocimeter, self.sensors_gyro,
            self.sensors_accelerometer]

  @property
  def dynamic_sensors(self):
    return [self.sensors_touch]
