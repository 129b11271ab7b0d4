"""A single-geom prop with frame sensors.

Behavioral contract: reference entities/props/primitive.py — one geom
plus framepos/framequat/framelinvel/frameangvel sensors, each exposed
as both an entity property and an observable. The sensor suite and its
observables are generated from one table.
"""

from __future__ import annotations

from dm_control_tpu import composer
from dm_control_tpu import mjcf
from dm_control_tpu.composer import define
from dm_control_tpu.composer.observation import observable

# property/observable name -> frame sensor kind
_SENSOR_TABLE = {
    'position': 'framepos',
    'orientation': 'framequat',
    'linear_velocity': 'framelinvel',
    'angular_velocity': 'frameangvel',
}


class Primitive(composer.Entity):
  """A prop consisting of one geom with pose/velocity sensors."""

  def _build(self, geom_type, size, name=None, **kwargs):
    self._mjcf_root = mjcf.RootElement(model=name or 'primitive')
    self._geom = self._mjcf_root.worldbody.add(
        'geom', name='geom', type=geom_type, size=size, **kwargs)
    self._sensors = {
        key: self._mjcf_root.sensor.add(
            kind, name=key, objtype='geom', objname=self._geom)
        for key, kind in _SENSOR_TABLE.items()}

  def _build_observables(self):
    return PrimitiveObservables(self)

  @property
  def geom(self):
    return self._geom

  @property
  def mjcf_model(self):
    return self._mjcf_root

  def __getattr__(self, item):
    sensors = self.__dict__.get('_sensors', {})
    if item in sensors:
      return sensors[item]
    raise AttributeError(
        f'{type(self).__name__!r} object has no attribute {item!r}')


def _sensor_observable(key):
  def getter(self):
    return observable.MJCFFeature('sensordata', getattr(self._entity, key))
  getter.__name__ = key
  descriptor = define.observable(getter)
  descriptor.__set_name__(None, key)
  return descriptor


class PrimitiveObservables(composer.Observables):
  """One observable per frame sensor, generated from the table."""


for _key in _SENSOR_TABLE:
  setattr(PrimitiveObservables, _key, _sensor_observable(_key))
