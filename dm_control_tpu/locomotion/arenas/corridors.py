"""Corridor arenas (reference locomotion/arenas/corridors.py:31-178)."""

from __future__ import annotations

import numpy as np

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


class WallsCorridor(EmptyCorridor):
  """A corridor obstructed by walls protruding from alternating sides.

  Behavioral contract: reference locomotion/arenas/corridors.py
  WallsCorridor — every `wall_gap` meters a wall of sampled
  `wall_width` juts from the left or right side; all scalar args may
  be composer variations, re-sampled by `regenerate` per episode.
  """

  def _build(self, wall_gap=2.5, wall_width=2.5, wall_height=2.0,
             swap_wall_side=True, wall_rgba=(1, 1, 1, 1),
             corridor_width=4, corridor_length=40,
             include_initial_padding=True,
             visible_side_planes=False, name='walls_corridor'):
    self._wall_gap = wall_gap
    self._wall_width = wall_width
    self._wall_height = wall_height
    self._swap_wall_side = swap_wall_side
    self._wall_rgba = wall_rgba
    self._include_initial_padding = include_initial_padding
    super()._build(corridor_width=corridor_width,
                   corridor_length=corridor_length,
                   visible_side_planes=visible_side_planes, name=name)
    self._obstacle_body = self.mjcf_model.worldbody.add(
        'body', name='obstacles')
    self.regenerate(np.random.RandomState(0))

  def regenerate(self, random_state):
    from dm_control_tpu.composer.variation import variation_values
    ev = lambda v: variation_values.evaluate(v, random_state=random_state)
    for geom in list(self._obstacle_body.get_children('geom')):
      geom.remove()
    length = self._current_corridor_length
    width = self._current_corridor_width
    height = ev(self._wall_height)
    x = 2.0 * ev(self._wall_gap) if self._include_initial_padding else (
        ev(self._wall_gap))
    side = 1
    i = 0
    while x < length:
      w = np.clip(ev(self._wall_width), 0.0, width)
      # wall spans from `side`'s edge w meters into the corridor
      y_center = side * (width / 2 - w / 2)
      self._obstacle_body.add(
          'geom', name=f'wall_{i}', type='box',
          size=[0.1, max(w / 2, 1e-3), height / 2],
          pos=[x, y_center, height / 2], rgba=list(self._wall_rgba))
      if self._swap_wall_side:
        side = -side
      x += ev(self._wall_gap)
      i += 1


class GapsCorridor(EmptyCorridor):
  """A corridor of platforms separated by gaps over a pit.

  Behavioral contract: reference locomotion/arenas/corridors.py
  GapsCorridor — a stretch of solid ground to start, then platforms
  of sampled `platform_length` separated by `gap_length` gaps; the
  ground plane drops away so a missed jump is unrecoverable.
  """

  _PIT_DEPTH = 10.0
  _START_PAD = 3.0

  def _build(self, platform_length=1., gap_length=2.5,
             corridor_width=4, corridor_length=40,
             ground_rgba=(0.5, 0.5, 0.5, 1),
             visible_side_planes=False, name='gaps_corridor'):
    self._platform_length = platform_length
    self._gap_length = gap_length
    self._ground_rgba = ground_rgba
    super()._build(corridor_width=corridor_width,
                   corridor_length=corridor_length,
                   visible_side_planes=visible_side_planes, name=name)
    # sink the safety plane to the bottom of the pit
    self._ground_plane.pos = [self._current_corridor_length / 2, 0,
                              -self._PIT_DEPTH]
    self._platform_body = self.mjcf_model.worldbody.add(
        'body', name='platforms')
    self._platform_geoms = ()
    self.regenerate(np.random.RandomState(0))

  def regenerate(self, random_state):
    from dm_control_tpu.composer.variation import variation_values
    ev = lambda v: variation_values.evaluate(v, random_state=random_state)
    for geom in list(self._platform_body.get_children('geom')):
      geom.remove()
    length = self._current_corridor_length
    width = self._current_corridor_width
    platforms = []
    x = 0.0
    i = 0
    thickness = 0.4
    first = self._START_PAD
    while x < length:
      plat = first if i == 0 else max(float(ev(self._platform_length)),
                                      1e-2)
      platforms.append(self._platform_body.add(
          'geom', name=f'platform_{i}', type='box',
          size=[plat / 2, width / 2, thickness / 2],
          pos=[x + plat / 2, 0, -thickness / 2],
          rgba=list(self._ground_rgba)))
      x += plat + max(float(ev(self._gap_length)), 0.0)
      i += 1
    self._platform_geoms = tuple(platforms)

  @property
  def ground_geoms(self):
    return (self._ground_plane,) + self._platform_geoms
