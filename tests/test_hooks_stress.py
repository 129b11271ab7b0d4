"""Hook-order and observation-pipeline stress tests.

Scenario coverage modeled on the reference's HooksTracker fixtures and
obs_buffer/updater suites (reference composer/hooks_test_utils.py:38-323,
composer/observation/obs_buffer.py:112-230): exact hook call order and
counts across episodes, attached-entity hook propagation, delayed and
out-of-order observation arrival, update intervals, and aggregation.
"""

import collections

import numpy as np
import pytest

jax = pytest.importorskip('jax')

from dm_control_tpu import composer  # noqa: E402
from dm_control_tpu.composer.observation import obs_buffer  # noqa: E402
from dm_control_tpu.composer.observation import observable  # noqa: E402
from dm_control_tpu.composer.observation.updater import Updater  # noqa: E402

N_SUB = 3


class TrackedEntity(composer.Entity):
  """Entity that logs every lifecycle hook call."""

  def _build(self, name='tracked', log=None):
    self._log = log if log is not None else []
    self._name = name
    from dm_control_tpu import mjcf
    self._mjcf_root = mjcf.RootElement(model=name)
    body = self._mjcf_root.worldbody.add('body', name='b')
    body.add('geom', name='g', type='sphere', size=[0.05], mass='0.1')
    body.add('joint', name='j', type='slide', axis=[0, 0, 1])

  @property
  def mjcf_model(self):
    return self._mjcf_root

  def _record(self, hook):
    self._log.append((self._name, hook))

  def initialize_episode_mjcf(self, random_state):
    self._record('initialize_episode_mjcf')

  def after_compile(self, physics, random_state):
    self._record('after_compile')

  def initialize_episode(self, physics, random_state):
    self._record('initialize_episode')

  def before_step(self, physics, random_state):
    self._record('before_step')

  def before_substep(self, physics, random_state):
    self._record('before_substep')

  def after_substep(self, physics, random_state):
    self._record('after_substep')

  def after_step(self, physics, random_state):
    self._record('after_step')


class TrackedArena(composer.Arena):

  def _build(self, name='arena', log=None):
    super()._build(name=name)
    self._log = log if log is not None else []
    self._name = name

  def _record(self, hook):
    self._log.append((self._name, hook))

  initialize_episode_mjcf = TrackedEntity.initialize_episode_mjcf
  after_compile = TrackedEntity.after_compile
  initialize_episode = TrackedEntity.initialize_episode
  before_step = TrackedEntity.before_step
  before_substep = TrackedEntity.before_substep
  after_substep = TrackedEntity.after_substep
  after_step = TrackedEntity.after_step


class TrackedTask(composer.Task):

  def __init__(self):
    self._log = []
    self._arena = TrackedArena(name='arena', log=self._log)
    self._child = TrackedEntity(name='child', log=self._log)
    self._arena.attach(self._child)
    self.set_timesteps(control_timestep=N_SUB * 0.002,
                       physics_timestep=0.002)

  @property
  def log(self):
    return self._log

  @property
  def root_entity(self):
    return self._arena

  def initialize_episode_mjcf(self, random_state):
    self._log.append(('task', 'initialize_episode_mjcf'))

  def after_compile(self, physics, random_state):
    self._log.append(('task', 'after_compile'))

  def initialize_episode(self, physics, random_state):
    self._log.append(('task', 'initialize_episode'))

  def before_step(self, physics, action, random_state):
    self._log.append(('task', 'before_step'))

  def before_substep(self, physics, action, random_state):
    assert action is not None
    self._log.append(('task', 'before_substep'))

  def after_substep(self, physics, random_state):
    self._log.append(('task', 'after_substep'))

  def after_step(self, physics, random_state):
    self._log.append(('task', 'after_step'))

  def get_reward(self, physics):
    return 0.0


@pytest.fixture
def tracked_env():
  task = TrackedTask()
  return composer.Environment(task, random_state=1), task


def test_hook_counts_and_order_across_episodes(tracked_env):
  env, task = tracked_env
  n_episodes, n_steps = 2, 3
  for _ in range(n_episodes):
    env.reset()
    for _ in range(n_steps):
      env.step(np.zeros(env.action_spec().shape))

  log = task.log
  counts = collections.Counter(hook for _, hook in log)
  total_steps = n_episodes * n_steps
  assert counts['initialize_episode_mjcf'] == 3 * n_episodes  # 3 hooked objects
  assert counts['after_compile'] == 3 * n_episodes
  assert counts['initialize_episode'] == 3 * n_episodes
  assert counts['before_step'] == 3 * total_steps
  assert counts['after_step'] == 3 * total_steps
  assert counts['before_substep'] == 3 * total_steps * N_SUB
  assert counts['after_substep'] == 3 * total_steps * N_SUB

  # exact phase ordering within one episode
  phases = [hook for _, hook in log]
  first_step_idx = phases.index('before_step')
  episode_prefix = phases[:first_step_idx]
  assert episode_prefix == (['initialize_episode_mjcf'] * 3 +
                            ['after_compile'] * 3 +
                            ['initialize_episode'] * 3)
  # a full control step: before_step*3, (before_substep*3,
  # after_substep*3) x N_SUB, after_step*3
  one_step = phases[first_step_idx:first_step_idx + 3 + 6 * N_SUB + 3]
  expected = (['before_step'] * 3 +
              ['before_substep'] * 3 * 1 + ['after_substep'] * 3)
  assert one_step[:3] == ['before_step'] * 3
  sub_section = one_step[3:3 + 6 * N_SUB]
  for k in range(N_SUB):
    seg = sub_section[6 * k:6 * (k + 1)]
    assert seg[:3] == ['before_substep'] * 3, seg
    assert seg[3:] == ['after_substep'] * 3, seg
  assert one_step[3 + 6 * N_SUB:] == ['after_step'] * 3


def test_entity_hooks_include_attached_children(tracked_env):
  env, task = tracked_env
  env.reset()
  env.step(np.zeros(env.action_spec().shape))
  names = {name for name, hook in task.log if hook == 'before_substep'}
  assert names == {'task', 'arena', 'child'}


# ---------------------------------------------------------------------------
# observation buffer stress (reference obs_buffer behaviors)
# ---------------------------------------------------------------------------


def test_buffer_out_of_order_arrival():
  buf = obs_buffer.Buffer(buffer_size=3, shape=(), dtype=float)
  buf.insert(0, 5, 1.0)    # arrives at t=5
  buf.insert(1, 1, 2.0)    # arrives at t=2
  buf.insert(2, 0, 3.0)    # arrives at t=2
  # at t=3 only the two early arrivals are visible
  np.testing.assert_array_equal(buf.read(3), [2.0, 2.0, 3.0])
  # at t=5 the delayed value lands LAST (latest arrival time)
  np.testing.assert_array_equal(buf.read(5), [2.0, 3.0, 1.0])


def test_buffer_pads_with_oldest_when_underfull():
  buf = obs_buffer.Buffer(buffer_size=4, shape=(), dtype=float)
  buf.insert(0, 0, 7.0)
  buf.insert(1, 0, 8.0)
  np.testing.assert_array_equal(buf.read(1), [7.0, 7.0, 7.0, 8.0])


def test_buffer_future_values_invisible():
  buf = obs_buffer.Buffer(buffer_size=1, shape=(), dtype=float)
  buf.insert(0, 0, 1.0)
  buf.insert(1, 10, 99.0)
  np.testing.assert_array_equal(buf.read(5), [1.0])
  np.testing.assert_array_equal(buf.read(11), [99.0])


class _FakePhysics:
  """Counter-driven physics double (reference fake_physics.py:26-80)."""

  def __init__(self):
    self.steps = 0


def test_updater_update_interval_and_aggregator():
  phys = _FakePhysics()
  obs = observable.Generic(lambda p: np.asarray(float(p.steps)))
  obs.enabled = True
  obs.update_interval = 2
  obs.buffer_size = 2
  obs.aggregator = 'mean'
  upd = Updater({'counter': obs}, physics_steps_per_control_step=4)
  upd.reset(phys, np.random.RandomState(0))
  for i in range(4):
    phys.steps = i + 1
    upd.update()
  # updates happened at substeps 2 and 4 -> buffer [2, 4]; mean = 3
  assert upd.get_observation()['counter'] == 3.0


def test_updater_delayed_observations():
  phys = _FakePhysics()
  obs = observable.Generic(lambda p: np.asarray(float(p.steps)))
  obs.enabled = True
  obs.delay = 2
  obs.buffer_size = 1
  upd = Updater({'v': obs}, physics_steps_per_control_step=1)
  upd.reset(phys, np.random.RandomState(0))
  phys.steps = 1
  upd.update()           # recorded at t=1, arrives t=3
  phys.steps = 2
  upd.update()           # recorded at t=2, arrives t=4
  # at t=2 only the reset-time observation (t=0, arrival 2) has landed
  assert upd.get_observation()['v'][0] == 0.0
