"""Flat floor arena (reference locomotion/arenas/floors.py:26)."""

from __future__ import annotations

from dm_control_tpu import composer

_GROUNDPLANE_QUAD_SIZE = 0.25


class Floor(composer.Arena):
  """An arena with a plane floor."""

  def _build(self, size=(8, 8), reflectance=.2, name='floor'):
    super()._build(name=name)
    self._size = size
    self._ground_geom = self.mjcf_model.worldbody.add(
        'geom', name='groundplane', type='plane',
        size=[size[0], size[1], _GROUNDPLANE_QUAD_SIZE])

  @property
  def ground_geoms(self):
    return (self._ground_geom,)

  @property
  def size(self):
    return self._size
