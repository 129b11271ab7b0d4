"""A single-geom prop with frame sensors
(reference entities/props/primitive.py:25-127)."""

from __future__ import annotations

from dm_control_tpu import composer
from dm_control_tpu import mjcf
from dm_control_tpu.composer.observation import observable


class Primitive(composer.Entity):
  """A prop consisting of one geom with position/velocity sensors."""

  def _build(self, geom_type, size, name=None, **kwargs):
    name = name or 'primitive'
    self._mjcf_root = mjcf.RootElement(model=name)
    self._geom = self._mjcf_root.worldbody.add(
        'geom', name='geom', type=geom_type, size=size, **kwargs)
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

  def _build_observables(self):
    return PrimitiveObservables(self)

  @property
  def geom(self):
    return self._geom

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


class PrimitiveObservables(composer.Observables):
  """Pose/velocity observables from the prop's frame sensors."""

  @composer.observable
  def position(self):
    return observable.MJCFFeature('sensordata',
                                  self._entity.position)

  @composer.observable
  def orientation(self):
    return observable.MJCFFeature('sensordata',
                                  self._entity.orientation)

  @composer.observable
  def linear_velocity(self):
    return observable.MJCFFeature('sensordata',
                                  self._entity.linear_velocity)

  @composer.observable
  def angular_velocity(self):
    return observable.MJCFFeature('sensordata',
                                  self._entity.angular_velocity)
