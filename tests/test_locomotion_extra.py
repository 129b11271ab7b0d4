"""Locomotion: maze generation/covering, go-to-target, maze goals."""

import numpy as np
import pytest

jax = pytest.importorskip('jax')

from dm_control_tpu import composer  # noqa: E402
from dm_control_tpu.locomotion.arenas import floors, mazes  # noqa: E402
from dm_control_tpu.locomotion.tasks import go_to_target  # noqa: E402
from dm_control_tpu.locomotion.tasks import random_goal_maze  # noqa: E402
from dm_control_tpu.locomotion.walkers import ant  # noqa: E402


def test_maze_covering_is_exact():
  for seed in range(5):
    m = mazes.TextMaze(height=9, width=11, seed=seed)
    rows = m.entity_layer.strip().split('\n')
    grid = np.array([[c == '*' for c in r] for r in rows])
    cov = np.zeros_like(grid)
    for w in mazes.make_walls(m.entity_layer):
      (r1, c1), (r2, c2) = w.start, w.end
      assert not np.any(cov[r1:r2, c1:c2]), 'walls overlap'
      cov[r1:r2, c1:c2] = True
    np.testing.assert_array_equal(cov, grid)


def test_maze_is_connected():
  # every open cell reachable from the spawn (randomized DFS is a
  # perfect maze)
  m = mazes.TextMaze(height=11, width=11, seed=2)
  rows = m.entity_layer.strip().split('\n')
  grid = np.array([[c != '*' for c in r] for r in rows])
  start = tuple(np.argwhere(grid)[0])
  seen = {start}
  stack = [start]
  while stack:
    r, c = stack.pop()
    for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
      n = (r + dr, c + dc)
      if (0 <= n[0] < grid.shape[0] and 0 <= n[1] < grid.shape[1]
          and grid[n] and n not in seen):
        seen.add(n)
        stack.append(n)
  assert len(seen) == int(grid.sum())


def test_go_to_target_episode():
  task = go_to_target.GoToTarget(walker=ant.Ant(), arena=floors.Floor())
  env = composer.Environment(task, random_state=7)
  ts = env.reset()
  assert ts.first()
  for _ in range(3):
    ts = env.step(np.zeros(env.action_spec().shape))
    assert np.isfinite(ts.reward)
  # moving the walker onto the target yields reward 1
  physics = env.physics
  tpos = task.target_position(physics)
  task._walker.set_pose(physics, position=[tpos[0], tpos[1], 0.3])
  physics.forward()
  assert task.get_reward(physics) == 1.0


def test_many_goals_maze_episode():
  maze = mazes.TextMaze(height=7, width=7, max_objects=2, seed=1)
  task = random_goal_maze.ManyGoalsMaze(
      walker=ant.Ant(), maze_arena=mazes.MazeWithTargets(maze=maze))
  env = composer.Environment(task, random_state=3)
  ts = env.reset()
  assert ts.first()
  ts = env.step(np.zeros(env.action_spec().shape))
  assert np.isfinite(ts.reward)
