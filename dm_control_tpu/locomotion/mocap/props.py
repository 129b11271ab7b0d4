"""Props constructed from motion-capture clip metadata.

Behavioral contract: reference locomotion/mocap/props.py — a free prop
whose shape/size/mass come from the clip, colored along a light->heavy
mass ramp, with pose sensors exposed as observables. Here a prop is
built from a plain `prop_info` dict ({'name', 'shape', 'size', 'mass'})
as produced by the loaders in `loader.py`.
"""

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu import mjcf
from dm_control_tpu.composer import define
from dm_control_tpu.composer.observation import observable
from dm_control_tpu.locomotion.mocap import trajectory as trajectory_lib

# mass -> color ramp endpoints (mass [kg], rgba)
_LIGHT = (3., np.array([0.77, 0.64, 0.21, 1.]))
_HEAVY = (10., np.array([0.77, 0.34, 0.21, 1.]))

_SHAPE_NAMES = {
    trajectory_lib.PROP_SHAPE_SPHERE: 'sphere',
    trajectory_lib.PROP_SHAPE_BOX: 'box',
}


def _mass_tinted_rgba(mass):
  t = np.clip((mass - _LIGHT[0]) / (_HEAVY[0] - _LIGHT[0]), 0., 1.)
  return (1 - t) * _LIGHT[1] + t * _HEAVY[1]


class Prop(composer.Entity):
  """A free prop whose shape/size/mass come from a mocap clip."""

  def _build(self, prop_info, rgba=None, priority_friction=False):
    mass = float(prop_info.get('mass', 1.0))
    size = np.asarray(prop_info.get('size', (0.1,)), dtype=float)
    root = mjcf.RootElement(
        model=str(prop_info.get('name') or 'mocap_prop'))
    self._mjcf_root = root
    self._geom = root.worldbody.add(
        'geom', name='geom', type=_SHAPE_NAMES[int(prop_info['shape'])],
        size=size, mass=mass,
        rgba=_mass_tinted_rgba(mass) if rgba is None else rgba)
    if priority_friction:
      # torsional/rolling friction scale with the contact patch size
      self._geom.priority = 1
      self._geom.condim = 6
      self._geom.friction = [.7, size[0] / 4, size[0] / 2]
    self._body_geom_ids = ()
    self._sensors = {
        key: root.sensor.add(kind, name=key, objtype='geom',
                             objname=self._geom)
        for key, kind in (('position', 'framepos'),
                          ('orientation', 'framequat'))}

  def _build_observables(self):
    return Observables(self)

  def update_with_new_prop(self, prop):
    self._geom.size = prop.geom.size
    self._geom.mass = prop.geom.mass
    self._geom.rgba = prop.geom.rgba

  mjcf_model = property(lambda self: self._mjcf_root)
  geom = property(lambda self: self._geom)
  position = property(lambda self: self._sensors['position'])
  orientation = property(lambda self: self._sensors['orientation'])


def _sensor_observable(key):
  def getter(self):
    return observable.MJCFFeature('sensordata',
                                  getattr(self._entity, key))
  getter.__name__ = key
  descriptor = define.observable(getter)
  descriptor.__set_name__(None, key)
  return descriptor


class Observables(composer.Observables):
  position = _sensor_observable('position')
  orientation = _sensor_observable('orientation')
