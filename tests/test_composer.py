"""Composer framework end-to-end tests (entity/task/environment/hooks).

Model: reference composer/environment_hooks_test.py + observation tests
(physics-independent logic) plus a real physics episode.
"""

import collections

import numpy as np
import pytest

from dm_control_tpu import composer
from dm_control_tpu import mjcf
from dm_control_tpu.composer.observation import observable


class Ball(composer.Entity):
  """A free sphere."""

  def _build(self, name='ball', radius=0.05):
    self._mjcf_root = mjcf.RootElement(model=name)
    body = self._mjcf_root.worldbody.add('body', name='sphere',
                                         pos=[0, 0, radius * 4])
    self._geom = body.add('geom', name='geom', type='sphere',
                          size=[radius], mass=0.1)
    self._body = body

  @property
  def mjcf_model(self):
    return self._mjcf_root

  def _build_observables(self):
    return BallObservables(self)


class BallObservables(composer.Observables):

  @composer.observable
  def position(self):
    return observable.MJCFFeature('xpos', self._entity._body)


class Floor(composer.Arena):

  def _build(self, name='floor_arena'):
    super()._build(name=name)
    self._ground = self.mjcf_model.worldbody.add(
        'geom', name='ground', type='plane', size=[5, 5, 0.1])


class DropTask(composer.Task):
  """Ball drops onto the floor; reward = 1 when at rest on ground."""

  def __init__(self):
    self._arena = Floor()
    self._ball = Ball()
    self._arena.add_free_entity(self._ball)
    self._hook_log = []
    for obs in self._ball.observables.as_dict().values():
      obs.enabled = True
    self.set_timesteps(0.02, 0.005)

  @property
  def root_entity(self):
    return self._arena

  def initialize_episode_mjcf(self, random_state):
    self._hook_log.append('initialize_episode_mjcf')

  def initialize_episode(self, physics, random_state):
    self._hook_log.append('initialize_episode')
    self._ball.set_pose(physics, position=[0.1, 0, 0.5])

  def before_step(self, physics, action, random_state):
    self._hook_log.append('before_step')

  def after_step(self, physics, random_state):
    self._hook_log.append('after_step')

  def get_reward(self, physics):
    height = physics.bind(self._ball._body).xpos[2]
    return float(height < 0.1)


@pytest.fixture(scope='module')
def env():
  return composer.Environment(DropTask(), time_limit=10.0,
                              random_state=42,
                              recompile_mjcf_every_episode=False)


def test_composer_episode(env):
  ts = env.reset()
  assert ts.first()
  obs = ts.observation
  assert 'ball/position' in obs
  # set_pose places the attachment FRAME (reference semantics); the
  # ball body sits 0.2 above its frame in the Ball model
  np.testing.assert_allclose(np.asarray(obs['ball/position']).ravel(),
                             [0.1, 0, 0.7], atol=1e-5)
  # drop: after enough steps the ball rests on the floor
  reward = 0.0
  for _ in range(60):
    ts = env.step(np.zeros(0))
    reward = ts.reward
    if reward:
      break
  assert reward == 1.0
  z = np.asarray(ts.observation['ball/position']).ravel()[2]
  assert 0.0 < z < 0.1


def test_hook_order(env):
  task = env.task
  task._hook_log.clear()
  env.reset()
  env.step(np.zeros(0))
  log = task._hook_log
  assert log[0] == 'initialize_episode_mjcf'
  assert 'initialize_episode' in log
  assert log.index('initialize_episode') > log.index(
      'initialize_episode_mjcf')
  assert log.index('after_step') > log.index('before_step')


def test_action_spec(env):
  spec = env.action_spec()
  assert spec.shape == (0,)


def test_entity_pose_api(env):
  env.reset()
  task = env.task
  pos, quat = task._ball.get_pose(env.physics)
  assert pos.shape == (3,)
  task._ball.set_pose(env.physics, position=[0.3, 0.2, 0.6])
  env.physics.forward()
  pos2, _ = task._ball.get_pose(env.physics)
  np.testing.assert_allclose(pos2, [0.3, 0.2, 0.6], atol=1e-5)


def test_variations():
  from dm_control_tpu.composer.variation import distributions, noises
  rs = np.random.RandomState(0)
  u = distributions.Uniform(0.0, 1.0)
  v = u(None, None, rs)
  assert 0 <= v <= 1
  expr = distributions.Uniform(1.0, 1.0) * 2 + 3
  assert float(expr(None, None, rs)) == 5.0
  add = noises.Additive(distributions.Normal(0.0, 0.0))
  assert add(7.0, None, rs) == 7.0
  walk = distributions.BiasedRandomWalk(stdev=0.1, timescale=5)
  vals = [walk(None, None, rs) for _ in range(100)]
  assert np.std(vals) > 0


def test_obs_buffer_delay():
  from dm_control_tpu.composer.observation import obs_buffer
  buf = obs_buffer.Buffer(2, (), np.float64)
  buf.insert(0, 0, 1.0)
  buf.insert(1, 2, 2.0)   # arrives at t=3
  buf.insert(2, 0, 3.0)   # arrives at t=2
  np.testing.assert_array_equal(buf.read(2), [1.0, 3.0])
  np.testing.assert_array_equal(buf.read(3), [3.0, 2.0])
