"""A 2x4 Duplo brick.

Behavioral contract: reference entities/props/duplo/__init__.py — the
stud-and-tube coupling brick whose stud radius (separation force) is
re-sampled per episode via `initialize_episode_mjcf`. The MJCF model
(duplo2x4.xml) and the autotuned radius table are reference task-spec
data (Apache-2.0, The dm_control Authors); the surrounding code is
restructured: stud/flange wiring is one config step and the sensor
observables are generated from a table.
"""

from __future__ import annotations

import os

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu import mjcf
from dm_control_tpu.composer import define
from dm_control_tpu.composer.observation import observable

_XML = os.path.join(os.path.dirname(__file__), 'duplo2x4.xml')

# (easy_align, flanges) -> (min, lower-quartile, max) stud radius, the
# empirically autotuned separation-force calibration (reference
# duplo/__init__.py:34-44)
_RADIUS_TABLE = {
    (False, False): (0.004685, 0.004781, 0.004898),
    (False, True): (0.004609, 0.004647, 0.004716),
    (True, False): (0.004754, 0.004844, 0.004953),
    (True, True): (0.004695, 0.004717, 0.004765),
}

_SENSORS = ('position', 'orientation', 'linear_velocity',
            'angular_velocity', 'force')


class Duplo(composer.Entity):
  """A 2x4 Duplo brick."""

  def _build(self, easy_align=False, flanges=True, variation=0.0,
             color=(1., 0., 0.)):
    self._mjcf_root = mjcf.from_path(_XML)
    self._configure_studs(easy_align, flanges)
    self._configure_radius_range(easy_align, flanges, variation)
    self._studs = self._site_grid('stud')
    self._holes = self._site_grid('hole')
    self._paint(color)

  def _configure_studs(self, easy_align, flanges):
    """Selects the active stud defaults class and its contact bits."""
    defaults = self._mjcf_root.default
    stud = defaults.find('default', 'stud')
    self._active_stud_dclass = stud
    if easy_align:
      # swap in the capsule studs: forgiving alignment
      stud.geom.group = 3
      stud.geom.contype = 9
      stud.geom.conaffinity = 8
      capsule = defaults.find('default', 'stud-capsule')
      capsule.geom.group = 0
      capsule.geom.contype = 0
      capsule.geom.conaffinity = 4
      self._active_stud_dclass = capsule
    if flanges:
      defaults.find('default', 'flange').geom.contype = 4

  def _configure_radius_range(self, easy_align, flanges, variation):
    lo, lq, hi = _RADIUS_TABLE[(easy_align, flanges)]
    anchor = (1 - variation) * lq
    self._radius_range = (anchor + variation * lo,
                          anchor + variation * hi)

  def _site_grid(self, kind):
    """(2, 4) object array of the brick's stud or hole sites."""
    grid = np.empty((2, 4), dtype=object)
    for row in range(2):
      for col in range(4):
        grid[row, col] = self._mjcf_root.find('site',
                                              f'{kind}_{row}{col}')
    return grid

  def _paint(self, color):
    if not all(0 <= v <= 1 for v in color):
      raise ValueError('All values in `color` must be between 0 and 1, '
                       f'got {color!r}.')
    rgba = np.array(self._mjcf_root.default.geom.rgba, copy=True)
    rgba[:3] = color
    self._mjcf_root.default.geom.rgba = rgba

  def initialize_episode_mjcf(self, random_state):
    """Re-samples the stud radius (separation force) per episode."""
    size = np.array(self._active_stud_dclass.geom.size, copy=True)
    size[0] = random_state.uniform(*self._radius_range)
    self._active_stud_dclass.geom.size = size

  def _build_observables(self):
    return DuploObservables(self)

  @property
  def studs(self):
    """(2, 4) array of stud site elements."""
    return self._studs

  @property
  def holes(self):
    """(2, 4) array of hole site elements."""
    return self._holes

  @property
  def mjcf_model(self):
    return self._mjcf_root


def _sensor_observable(key):
  def getter(self):
    return observable.MJCFFeature(
        'sensordata', self._entity.mjcf_model.find('sensor', key))
  getter.__name__ = key
  descriptor = define.observable(getter)
  descriptor.__set_name__(None, key)
  return descriptor


class DuploObservables(composer.Observables,
                       composer.FreePropObservableMixin):
  """One observable per XML-declared sensor."""


for _key in _SENSORS:
  setattr(DuploObservables, _key, _sensor_observable(_key))
