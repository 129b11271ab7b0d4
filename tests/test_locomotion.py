"""Locomotion library: ant walker in a corridor, full composer episode."""

import numpy as np
import pytest

from dm_control_tpu import composer
from dm_control_tpu.locomotion.arenas import EmptyCorridor, Floor
from dm_control_tpu.locomotion.tasks import RunThroughCorridor
from dm_control_tpu.locomotion.walkers import Ant


@pytest.fixture(scope='module')
def env():
  walker = Ant()
  arena = EmptyCorridor(corridor_length=20)
  task = RunThroughCorridor(walker, arena,
                            walker_spawn_position=(1, 0, 0.5),
                            target_velocity=3.0)
  return composer.Environment(task, time_limit=5.0, random_state=7,
                              recompile_mjcf_every_episode=False)


def test_ant_corridor_episode(env):
  ts = env.reset()
  assert 'walker/joints_pos' in ts.observation
  assert ts.observation['walker/joints_pos'].shape[-1] == 8
  spec = env.action_spec()
  assert spec.shape == (8,)
  rng = np.random.RandomState(0)
  for _ in range(10):
    ts = env.step(rng.uniform(spec.minimum, spec.maximum, spec.shape))
    assert np.isfinite(ts.reward)
  walker = env.task._walker
  pos, quat = walker.get_pose(env.physics)
  assert 0.1 < pos[2] < 1.0  # settled on its legs, not fallen through


def test_walker_egocentric_transform(env):
  env.reset()
  walker = env.task._walker
  vec = walker.transform_vec_to_egocentric_frame(
      env.physics, np.array([1.0, 0, 0]))
  assert vec.shape == (3,)
  np.testing.assert_allclose(np.linalg.norm(vec), 1.0, atol=1e-5)


def test_floor_arena_builds():
  import dm_control_tpu.models as M
  floor = Floor()
  m = M.from_xml_string(floor.mjcf_model.to_xml_string())
  assert m.ngeom == 1
