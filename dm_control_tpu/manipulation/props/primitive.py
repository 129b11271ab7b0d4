"""Single-geom props with pose + touch sensing.

Behavioral contract: reference manipulation/props/primitive.py — a
Primitive entity exposing framepos/framequat/framelinvel/frameangvel
and touch sensors as observables, plus shape-specific conveniences.
Here the sensor suite and its observables are generated from one table.
"""

import itertools

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu import mjcf
from dm_control_tpu.composer import define
from dm_control_tpu.composer.observation import observable

_DEFAULT_HALF_LENGTHS = [0.05, 0.1, 0.15]

# observable/property name -> frame sensor kind
_FRAME_SENSORS = {
    'position': 'framepos',
    'orientation': 'framequat',
    'linear_velocity': 'framelinvel',
    'angular_velocity': 'frameangvel',
}


class Primitive(composer.Entity):
  """A prop consisting of one primitive geom, fully sensed."""

  def _build(self, geom_type, size, mass=None, name=None):
    size = np.reshape(np.asarray(size), -1)
    self._mjcf_root = mjcf.RootElement(model=name)
    self._name = name
    self._geom = self._mjcf_root.worldbody.add(
        'geom', name='body_geom', type=geom_type, size=size, mass=mass)

    sensors = self._mjcf_root.sensor
    self._frame_sensors = {
        prop_name: sensors.add(kind, name=prop_name, objtype='geom',
                               objname=self._geom)
        for prop_name, kind in _FRAME_SENSORS.items()}
    probe_site = self._mjcf_root.worldbody.add(
        'site', type=geom_type, name='touch_sensor', size=size * 1.05,
        rgba=[1, 1, 1, 0.1], group=composer.SENSOR_SITES_GROUP)
    self._touch = sensors.add('touch', site=probe_site)

  def _build_observables(self):
    return PrimitiveObservables(self)

  @property
  def geom(self):
    return self._geom

  @property
  def touch(self):
    return self._touch

  @property
  def mjcf_model(self):
    return self._mjcf_root

  @property
  def name(self):
    return self._name

  def __getattr__(self, item):
    sensors = self.__dict__.get('_frame_sensors', {})
    if item in sensors:
      return sensors[item]
    raise AttributeError(
        f'{type(self).__name__!r} object has no attribute {item!r}')


def _sensor_observable(prop_name):
  def getter(self):
    return observable.MJCFFeature(
        'sensordata', getattr(self._entity, prop_name))
  getter.__name__ = prop_name
  descriptor = define.observable(getter)
  descriptor.__set_name__(None, prop_name)
  return descriptor


class PrimitiveObservables(composer.Observables,
                           composer.FreePropObservableMixin):
  """One observable per sensed quantity, generated from the table."""
  touch = _sensor_observable('touch')


for _prop_name in _FRAME_SENSORS:
  setattr(PrimitiveObservables, _prop_name, _sensor_observable(_prop_name))


def _shape(geom_type, signature):
  """Makes a Primitive subclass whose _build maps `signature` kwargs
  (an ordered dict of name -> default; None defaults fall back to
  _DEFAULT_HALF_LENGTHS) onto the geom size vector."""

  def _build(self, mass=None, name=geom_type, **kwargs):
    parts = []
    for arg, default in signature.items():
      value = kwargs.pop(arg, None)
      if value is None:
        value = default if default is not None else _DEFAULT_HALF_LENGTHS
      parts.append(np.reshape(np.asarray(value, dtype=float), -1))
    if kwargs:
      raise TypeError(f'unexpected arguments: {sorted(kwargs)}')
    Primitive._build(self, geom_type=geom_type,
                     size=np.concatenate(parts), mass=mass, name=name)

  return type(geom_type.capitalize(), (Primitive,), {'_build': _build})


Sphere = _shape('sphere', {'radius': 0.05})
Box = _shape('box', {'half_lengths': None})
Ellipsoid = _shape('ellipsoid', {'radii': None})
Cylinder = _shape('cylinder', {'radius': 0.05, 'half_length': 0.15})
Capsule = _shape('capsule', {'radius': 0.05, 'half_length': 0.15})


class BoxWithSites(Box):
  """A box prop with a site at each corner."""

  def _build(self, half_lengths=None, mass=None, name='box'):
    half_lengths = half_lengths or _DEFAULT_HALF_LENGTHS
    super()._build(half_lengths=half_lengths, mass=mass, name=name)
    corners = itertools.product(*((h, -h) for h in half_lengths))
    self._corner_sites = tuple(
        self._mjcf_root.worldbody.add(
            'site', type='sphere', name=f'corner_{i}', size=[0.1],
            pos=list(pos), rgba=[1, 0, 0, 1.0],
            group=composer.SENSOR_SITES_GROUP)
        for i, pos in enumerate(corners))

  @property
  def corner_sites(self):
    return self._corner_sites
