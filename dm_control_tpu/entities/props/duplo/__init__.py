"""A 2x4 Duplo brick.

Behavioural counterpart of reference
dm_control/entities/props/duplo/__init__.py:50-169: the stud-and-tube
coupling brick whose stud radius (and therefore separation force) is
re-sampled per episode through `initialize_episode_mjcf`. The MJCF model
(duplo2x4.xml, all primitive geoms) is reference data — see the
calibration table below, which reproduces the reference's empirically
autotuned stud radii.
"""

from __future__ import annotations

import collections
import os

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu import mjcf
from dm_control_tpu.composer import define
from dm_control_tpu.composer.observation import observable

_DUPLO_XML_PATH = os.path.join(os.path.dirname(__file__),
                               'duplo2x4.xml')

_StudSize = collections.namedtuple(
    '_StudSize', ['minimum', 'lower_quartile', 'maximum'])
_StudParams = collections.namedtuple('_StudParams',
                                     ['easy_align', 'flanges'])

# Autotuned stud radii reproducing the empirical separation-force
# distribution of real bricks (reference duplo/__init__.py:34-44)
_STUD_SIZE_PARAMS = {
    _StudParams(easy_align=False, flanges=False):
        _StudSize(0.004685, 0.004781, 0.004898),
    _StudParams(easy_align=False, flanges=True):
        _StudSize(0.004609, 0.004647, 0.004716),
    _StudParams(easy_align=True, flanges=False):
        _StudSize(0.004754, 0.004844, 0.004953),
    _StudParams(easy_align=True, flanges=True):
        _StudSize(0.004695, 0.004717, 0.004765),
}

_COLOR_NOT_BETWEEN_0_AND_1 = (
    'All values in `color` must be between 0 and 1, got {!r}.')


class Duplo(composer.Entity):
  """A 2x4 Duplo brick."""

  def _build(self, easy_align=False, flanges=True, variation=0.0,
             color=(1., 0., 0.)):
    self._mjcf_root = mjcf.from_path(_DUPLO_XML_PATH)

    stud = self._mjcf_root.default.find('default', 'stud')
    if easy_align:
      # capsule studs instead of cylinders: easier to align
      stud.geom.group = 3
      stud.geom.contype = 9
      stud.geom.conaffinity = 8
      stud_cap = self._mjcf_root.default.find('default', 'stud-capsule')
      stud_cap.geom.group = 0
      stud_cap.geom.contype = 0
      stud_cap.geom.conaffinity = 4
      self._active_stud_dclass = stud_cap
    else:
      self._active_stud_dclass = stud

    if flanges:
      flange_dclass = self._mjcf_root.default.find('default', 'flange')
      flange_dclass.geom.contype = 4

    stud_size = _STUD_SIZE_PARAMS[(easy_align, flanges)]
    offset = (1 - variation) * stud_size.lower_quartile
    self._lower = offset + variation * stud_size.minimum
    self._upper = offset + variation * stud_size.maximum

    self._studs = np.ndarray((2, 4), dtype=object)
    self._holes = np.ndarray((2, 4), dtype=object)
    for row in range(2):
      for column in range(4):
        self._studs[row, column] = self._mjcf_root.find(
            'site', f'stud_{row}{column}')
        self._holes[row, column] = self._mjcf_root.find(
            'site', f'hole_{row}{column}')

    if not all(0 <= value <= 1 for value in color):
      raise ValueError(_COLOR_NOT_BETWEEN_0_AND_1.format(color))
    rgba = np.array(self._mjcf_root.default.geom.rgba, copy=True)
    rgba[:3] = color
    self._mjcf_root.default.geom.rgba = rgba

  def initialize_episode_mjcf(self, random_state):
    """Re-samples the stud radius (separation force) per episode."""
    radius = random_state.uniform(self._lower, self._upper)
    size = np.array(self._active_stud_dclass.geom.size, copy=True)
    size[0] = radius
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


class DuploObservables(composer.Observables,
                       composer.FreePropObservableMixin):
  """Observables for the `Duplo` prop."""

  @define.observable
  def position(self):
    return observable.MJCFFeature(
        'sensordata', self._entity.mjcf_model.find('sensor', 'position'))

  @define.observable
  def orientation(self):
    return observable.MJCFFeature(
        'sensordata',
        self._entity.mjcf_model.find('sensor', 'orientation'))

  @define.observable
  def linear_velocity(self):
    return observable.MJCFFeature(
        'sensordata',
        self._entity.mjcf_model.find('sensor', 'linear_velocity'))

  @define.observable
  def angular_velocity(self):
    return observable.MJCFFeature(
        'sensordata',
        self._entity.mjcf_model.find('sensor', 'angular_velocity'))

  @define.observable
  def force(self):
    return observable.MJCFFeature(
        'sensordata', self._entity.mjcf_model.find('sensor', 'force'))
