"""Corridor arenas (reference locomotion/arenas/corridors.py:31-178)."""

from __future__ import annotations

from dm_control_tpu import composer

_SIDE_WALL_HEIGHT = 4.0


class EmptyCorridor(composer.Arena):
  """A straight corridor with side walls and no obstacles."""

  def _build(self, corridor_width=4, corridor_length=40,
             visible_side_planes=False, name='empty_corridor'):
    super()._build(name=name)
    self._corridor_width = corridor_width
    self._corridor_length = corridor_length

    world = self.mjcf_model.worldbody
    self._ground_plane = world.add(
        'geom', name='ground', type='plane',
        size=[corridor_length + 2, corridor_width * 2, 0.25],
        pos=[corridor_length / 2, 0, 0])
    half_w = corridor_width / 2
    self._left_plane = world.add(
        'geom', name='left_wall', type='plane',
        zaxis=[0, -1, 0],
        size=[corridor_length + 2, _SIDE_WALL_HEIGHT, 0.5],
        pos=[corridor_length / 2, half_w, _SIDE_WALL_HEIGHT / 2])
    self._right_plane = world.add(
        'geom', name='right_wall', type='plane',
        zaxis=[0, 1, 0],
        size=[corridor_length + 2, _SIDE_WALL_HEIGHT, 0.5],
        pos=[corridor_length / 2, -half_w, _SIDE_WALL_HEIGHT / 2])
    self._current_corridor_length = corridor_length
    self._current_corridor_width = corridor_width

  def regenerate(self, random_state):
    """Resamples the corridor (no-op for the empty corridor)."""
    del random_state

  @property
  def corridor_length(self):
    return self._current_corridor_length

  @property
  def corridor_width(self):
    return self._current_corridor_width

  @property
  def ground_geoms(self):
    return (self._ground_plane,)
