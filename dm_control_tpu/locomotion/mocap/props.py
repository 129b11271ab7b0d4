"""Props constructed from motion-capture clip metadata.

Behavioural counterpart of the reference's proto-backed mocap props
(reference: dm_control/locomotion/mocap/props.py:44-110); here a prop is
built from a plain `prop_info` dict ({'name', 'shape', 'size', 'mass'})
as produced by the loaders in `loader.py`.
"""

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu import mjcf
from dm_control_tpu.composer import define
from dm_control_tpu.composer.observation import observable
from dm_control_tpu.locomotion.mocap import trajectory as trajectory_lib

_DEFAULT_LIGHT_PROP_RGBA = np.array([0.77, 0.64, 0.21, 1.])
_DEFAULT_LIGHT_PROP_MASS = 3.

_DEFAULT_HEAVY_PROP_RGBA = np.array([0.77, 0.34, 0.21, 1.])
_DEFAULT_HEAVY_PROP_MASS = 10.

_PROP_SHAPE = {
    trajectory_lib.PROP_SHAPE_SPHERE: 'sphere',
    trajectory_lib.PROP_SHAPE_BOX: 'box',
}


def _default_prop_rgba(prop_mass):
  normalized = np.clip(
      (prop_mass - _DEFAULT_LIGHT_PROP_MASS) /
      (_DEFAULT_HEAVY_PROP_MASS - _DEFAULT_LIGHT_PROP_MASS), 0., 1.)
  return ((1 - normalized) * _DEFAULT_LIGHT_PROP_RGBA +
          normalized * _DEFAULT_HEAVY_PROP_RGBA)


class Prop(composer.Entity):
  """A free prop whose shape/size/mass come from a mocap clip."""

  def _build(self, prop_info, rgba=None, priority_friction=False):
    mass = float(prop_info.get('mass', 1.0))
    size = np.asarray(prop_info.get('size', (0.1,)), dtype=float)
    shape = _PROP_SHAPE[int(prop_info['shape'])]
    if rgba is None:
      rgba = _default_prop_rgba(mass)
    self._mjcf_root = mjcf.RootElement(
        model=str(prop_info.get('name') or 'mocap_prop'))
    self._geom = self._mjcf_root.worldbody.add(
        'geom', name='geom', type=shape, size=size, mass=mass, rgba=rgba)
    if priority_friction:
      # torsional/rolling friction scale with the contact patch size
      self._geom.priority = 1
      self._geom.condim = 6
      self._geom.friction = [.7, size[0] / 4, size[0] / 2]
    self._body_geom_ids = ()
    self._position = self._mjcf_root.sensor.add(
        'framepos', name='position', objtype='geom', objname=self._geom)
    self._orientation = self._mjcf_root.sensor.add(
        'framequat', name='orientation', objtype='geom', objname=self._geom)

  def _build_observables(self):
    return Observables(self)

  @property
  def mjcf_model(self):
    return self._mjcf_root

  @property
  def geom(self):
    return self._geom

  def update_with_new_prop(self, prop):
    self._geom.size = prop.geom.size
    self._geom.mass = prop.geom.mass
    self._geom.rgba = prop.geom.rgba

  @property
  def position(self):
    return self._position

  @property
  def orientation(self):
    return self._orientation


class Observables(composer.Observables):

  @define.observable
  def position(self):
    return observable.MJCFFeature('sensordata', self._entity.position)

  @define.observable
  def orientation(self):
    return observable.MJCFFeature('sensordata', self._entity.orientation)
