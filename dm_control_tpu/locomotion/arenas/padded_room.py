"""A square room maze whose outermost cells are always empty
(behavioural counterpart of reference
dm_control/locomotion/arenas/padded_room.py:22-90), built on the
in-repo text-maze module instead of labmaze.
"""

import numpy as np

from dm_control_tpu.locomotion.arenas.mazes import (
    SPAWN_CHAR, TARGET_CHAR, WALL_CHAR)

_PADDING = 4


class PaddedRoom:
  """An empty room with `num_objects` object tokens and spawn points."""

  def __init__(self, room_size, num_objects=0, random_state=None,
               pad_with_walls=True, num_agent_spawn_positions=1):
    self._room_size = room_size
    self._num_objects = num_objects
    self._num_agent_spawn_positions = num_agent_spawn_positions
    self._rng = random_state or np.random
    self._pad_with_walls = pad_with_walls
    self._grid = np.full(
        (room_size + _PADDING, room_size + _PADDING), '.', dtype='<U1')
    if pad_with_walls:
      self._grid[0, :] = WALL_CHAR
      self._grid[-1, :] = WALL_CHAR
      self._grid[:, 0] = WALL_CHAR
      self._grid[:, -1] = WALL_CHAR
    self.regenerate()

  def regenerate(self, random_state=None):
    rng = random_state if random_state is not None else self._rng
    self._grid[1:-1, 1:-1] = ' '
    chosen = list(rng.choice(
        self._room_size * self._room_size,
        self._num_objects + self._num_agent_spawn_positions,
        replace=False))
    pad = _PADDING // 2
    for i, cell in enumerate(chosen):
      token = (SPAWN_CHAR if i < self._num_agent_spawn_positions
               else TARGET_CHAR)
      r, c = cell // self._room_size, cell % self._room_size
      self._grid[r + pad, c + pad] = token
    return self.entity_layer

  @property
  def entity_layer(self):
    return '\n'.join(''.join(row) for row in self._grid) + '\n'

  @property
  def width(self):
    return self._room_size + _PADDING

  @property
  def height(self):
    return self._room_size + _PADDING
