"""Maze arenas with an in-repo maze generator.

Replaces the external labmaze dependency (reference
locomotion/arenas/mazes.py:24 imports `labmaze`) with a from-scratch
subset: a randomized-DFS maze generator emitting the same text-grid
format ('*' wall, ' ' corridor, 'P' spawn, 'G' target), plus the greedy
wall covering of reference locomotion/arenas/covering.py:24-122 that
turns wall cells into a small set of box geoms.
"""

from __future__ import annotations

import collections

import numpy as np

from dm_control_tpu import composer

WALL_CHAR = '*'
SPAWN_CHAR = 'P'
TARGET_CHAR = 'G'

Wall = collections.namedtuple('Wall', ('start', 'end'))  # (row, col)


class TextMaze:
  """Random maze in labmaze's text-grid format (needed subset)."""

  def __init__(self, height=9, width=9, max_spawns=1, max_objects=1,
               random_state=None, seed=None):
    if height % 2 == 0 or width % 2 == 0:
      raise ValueError('maze height/width must be odd')
    self._height = height
    self._width = width
    self._max_spawns = max_spawns
    self._max_objects = max_objects
    self._rng = (random_state if random_state is not None
                 else np.random.RandomState(seed))
    self.regenerate()

  @property
  def entity_layer(self):
    return self._entity_layer

  @property
  def height(self):
    return self._height

  @property
  def width(self):
    return self._width

  def regenerate(self, random_state=None):
    rng = random_state if random_state is not None else self._rng
    h, w = self._height, self._width
    grid = np.full((h, w), WALL_CHAR, dtype='<U1')
    # randomized DFS over the odd-cell lattice
    start = (1, 1)
    grid[start] = ' '
    stack = [start]
    while stack:
      r, c = stack[-1]
      neighbors = []
      for dr, dc in ((2, 0), (-2, 0), (0, 2), (0, -2)):
        nr, nc = r + dr, c + dc
        if 1 <= nr < h - 1 and 1 <= nc < w - 1 and grid[nr, nc] == WALL_CHAR:
          neighbors.append((nr, nc))
      if neighbors:
        nr, nc = neighbors[rng.randint(len(neighbors))]
        grid[(r + nr) // 2, (c + nc) // 2] = ' '
        grid[nr, nc] = ' '
        stack.append((nr, nc))
      else:
        stack.pop()
    # place spawn and object tokens on distinct open cells
    open_cells = list(zip(*np.where(grid == ' ')))
    rng.shuffle(open_cells)
    for _ in range(self._max_spawns):
      if open_cells:
        grid[open_cells.pop()] = SPAWN_CHAR
    for _ in range(self._max_objects):
      if open_cells:
        grid[open_cells.pop()] = TARGET_CHAR
    self._entity_layer = '\n'.join(''.join(row) for row in grid) + '\n'
    return self._entity_layer


def make_walls(entity_layer: str):
  """Greedy rectangle covering of wall cells
  (reference locomotion/arenas/covering.py:24-122)."""
  rows = [list(r) for r in entity_layer.strip('\n').split('\n')]
  grid = np.array([[c == WALL_CHAR for c in r] for r in rows])
  covered = np.zeros_like(grid)
  walls = []
  h, w = grid.shape
  for r in range(h):
    for c in range(w):
      if not grid[r, c] or covered[r, c]:
        continue
      # grow the widest row run, then extend downward while full
      c2 = c
      while c2 + 1 < w and grid[r, c2 + 1] and not covered[r, c2 + 1]:
        c2 += 1
      r2 = r
      while (r2 + 1 < h and
             np.all(grid[r2 + 1, c:c2 + 1]) and
             not np.any(covered[r2 + 1, c:c2 + 1])):
        r2 += 1
      covered[r:r2 + 1, c:c2 + 1] = True
      walls.append(Wall((r, c), (r2 + 1, c2 + 1)))
  return walls


class MazeWithTargets(composer.Arena):
  """Maze arena: wall boxes from the text grid, queryable spawn/target
  world positions (reference locomotion/arenas/mazes.py:24+)."""

  def _build(self, maze=None, xy_scale=2.0, z_height=2.0,
             name='maze'):
    super()._build(name=name)
    self._maze = maze if maze is not None else TextMaze(seed=0)
    self._xy_scale = xy_scale
    self._z_height = z_height
    size = max(self._maze.height, self._maze.width) * xy_scale
    self._ground_geom = self.mjcf_model.worldbody.add(
        'geom', name='groundplane', type='plane',
        size=[size, size, 0.25])
    self._wall_geoms = []
    self._spawn_positions = []
    self._target_positions = []
    self._rebuild_walls()

  @property
  def maze(self):
    return self._maze

  @property
  def ground_geoms(self):
    return (self._ground_geom,)

  @property
  def size(self):
    s = max(self._maze.height, self._maze.width) * self._xy_scale
    return (s, s)

  @property
  def spawn_positions(self):
    return tuple(self._spawn_positions)

  @property
  def target_positions(self):
    return tuple(self._target_positions)

  def _cell_to_world(self, row, col):
    h, w = self._maze.height, self._maze.width
    x = (col - (w - 1) / 2) * self._xy_scale
    y = ((h - 1) / 2 - row) * self._xy_scale
    return x, y

  def _rebuild_walls(self):
    for g in self._wall_geoms:
      g.remove()
    self._wall_geoms = []
    self._spawn_positions = []
    self._target_positions = []
    layer = self._maze.entity_layer
    for i, wall in enumerate(make_walls(layer)):
      (r1, c1), (r2, c2) = wall.start, wall.end
      cx = (c1 + c2 - 1) / 2
      cy = (r1 + r2 - 1) / 2
      x, y = self._cell_to_world(cy, cx)
      hx = (c2 - c1) / 2 * self._xy_scale
      hy = (r2 - r1) / 2 * self._xy_scale
      self._wall_geoms.append(self.mjcf_model.worldbody.add(
          'geom', name=f'wall_{i}', type='box',
          pos=[x, y, self._z_height / 2],
          size=[hx, hy, self._z_height / 2]))
    rows = layer.strip('\n').split('\n')
    for r, row in enumerate(rows):
      for c, ch in enumerate(row):
        if ch == SPAWN_CHAR:
          self._spawn_positions.append(self._cell_to_world(r, c))
        elif ch == TARGET_CHAR:
          self._target_positions.append(self._cell_to_world(r, c))

  def regenerate(self, random_state=None):
    self._maze.regenerate(random_state)
    self._rebuild_walls()


class RandomMazeWithTargets(MazeWithTargets):
  """Maze arena with a freshly generated random maze per episode.

  Behavioral contract: reference locomotion/arenas/mazes.py
  RandomMazeWithTargets — labmaze RandomMaze parameters mapped onto
  the in-repo TextMaze generator. Texture arguments are accepted and
  ignored (the on-device ray-caster shades from geom rgba).
  """

  def _build(self, x_cells=11, y_cells=11, xy_scale=2.0, z_height=2.0,
             max_rooms=-1, room_min_size=3, room_max_size=5,
             spawns_per_room=0, targets_per_room=0, max_variations=0,
             simplify=True, skybox_texture=None, wall_textures=None,
             floor_textures=None, aesthetic='default', name='maze'):
    del (max_rooms, room_min_size, room_max_size, max_variations,
         simplify, skybox_texture, wall_textures, floor_textures,
         aesthetic)
    # odd lattice dims required by the DFS generator
    width = x_cells | 1
    height = y_cells | 1
    maze = TextMaze(height=height, width=width,
                    max_spawns=max(spawns_per_room, 1) * 4,
                    max_objects=max(targets_per_room, 1) * 4, seed=0)
    super()._build(maze=maze, xy_scale=xy_scale, z_height=z_height,
                   name=name)
