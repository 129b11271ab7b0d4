"""Props made of a single primitive MuJoCo geom
(reference manipulation/props/primitive.py:15-212)."""

import itertools

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu import mjcf
from dm_control_tpu.composer import define
from dm_control_tpu.composer.observation import observable

_DEFAULT_HALF_LENGTHS = [0.05, 0.1, 0.15]


class Primitive(composer.Entity):
  """A primitive MuJoCo geom prop with pose + touch sensors."""

  def _build(self, geom_type, size, mass=None, name=None):
    size = np.reshape(np.asarray(size), -1)
    self._mjcf_root = mjcf.RootElement(model=name)
    self._geom = self._mjcf_root.worldbody.add(
        'geom', name='body_geom', type=geom_type, size=size, mass=mass)
    touch_site = self._mjcf_root.worldbody.add(
        'site', type=geom_type, name='touch_sensor', size=size * 1.05,
        rgba=[1, 1, 1, 0.1], group=composer.SENSOR_SITES_GROUP)
    self._touch = self._mjcf_root.sensor.add('touch', site=touch_site)
    self._position = self._mjcf_root.sensor.add(
        'framepos', name='position', objtype='geom',
        objname=self._geom)
    self._orientation = self._mjcf_root.sensor.add(
        'framequat', name='orientation', objtype='geom',
        objname=self._geom)
    self._linear_velocity = self._mjcf_root.sensor.add(
        'framelinvel', name='linear_velocity', objtype='geom',
        objname=self._geom)
    self._angular_velocity = self._mjcf_root.sensor.add(
        'frameangvel', name='angular_velocity', objtype='geom',
        objname=self._geom)
    self._name = name

  def _build_observables(self):
    return PrimitiveObservables(self)

  @property
  def geom(self):
    return self._geom

  @property
  def touch(self):
    return self._touch

  @property
  def position(self):
    return self._position

  @property
  def orientation(self):
    return self._orientation

  @property
  def linear_velocity(self):
    return self._linear_velocity

  @property
  def angular_velocity(self):
    return self._angular_velocity

  @property
  def mjcf_model(self):
    return self._mjcf_root

  @property
  def name(self):
    return self._name


class PrimitiveObservables(composer.Observables,
                           composer.FreePropObservableMixin):
  """Primitive entity's observables."""

  @define.observable
  def position(self):
    return observable.MJCFFeature('sensordata', self._entity.position)

  @define.observable
  def orientation(self):
    return observable.MJCFFeature('sensordata',
                                  self._entity.orientation)

  @define.observable
  def linear_velocity(self):
    return observable.MJCFFeature('sensordata',
                                  self._entity.linear_velocity)

  @define.observable
  def angular_velocity(self):
    return observable.MJCFFeature('sensordata',
                                  self._entity.angular_velocity)

  @define.observable
  def touch(self):
    return observable.MJCFFeature('sensordata', self._entity.touch)


class Sphere(Primitive):
  """A sphere prop."""

  def _build(self, radius=0.05, mass=None, name='sphere'):
    super()._build(geom_type='sphere', size=radius, mass=mass,
                   name=name)


class Box(Primitive):
  """A box prop."""

  def _build(self, half_lengths=None, mass=None, name='box'):
    half_lengths = half_lengths or _DEFAULT_HALF_LENGTHS
    super()._build(geom_type='box', size=half_lengths, mass=mass,
                   name=name)


class BoxWithSites(Box):
  """A box prop with sites on the corners."""

  def _build(self, half_lengths=None, mass=None, name='box'):
    half_lengths = half_lengths or _DEFAULT_HALF_LENGTHS
    super()._build(half_lengths=half_lengths, mass=mass, name=name)
    corner_positions = itertools.product(
        [half_lengths[0], -half_lengths[0]],
        [half_lengths[1], -half_lengths[1]],
        [half_lengths[2], -half_lengths[2]])
    corner_sites = []
    for i, corner_pos in enumerate(corner_positions):
      corner_sites.append(self._mjcf_root.worldbody.add(
          'site', type='sphere', name=f'corner_{i}', size=[0.1],
          pos=list(corner_pos), rgba=[1, 0, 0, 1.0],
          group=composer.SENSOR_SITES_GROUP))
    self._corner_sites = tuple(corner_sites)

  @property
  def corner_sites(self):
    return self._corner_sites


class Ellipsoid(Primitive):
  """An ellipsoid prop."""

  def _build(self, radii=None, mass=None, name='ellipsoid'):
    radii = radii or _DEFAULT_HALF_LENGTHS
    super()._build(geom_type='ellipsoid', size=radii, mass=mass,
                   name=name)


class Cylinder(Primitive):
  """A cylinder prop."""

  def _build(self, radius=0.05, half_length=0.15, mass=None,
             name='cylinder'):
    super()._build(geom_type='cylinder', size=[radius, half_length],
                   mass=mass, name=name)


class Capsule(Primitive):
  """A capsule prop."""

  def _build(self, radius=0.05, half_length=0.15, mass=None,
             name='capsule'):
    super()._build(geom_type='capsule', size=[radius, half_length],
                   mass=mass, name=name)
