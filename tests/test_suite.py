"""Suite-wide environment sweep (model: reference suite/suite_test.py).

For every registered task: load, reset, step with random actions,
validate specs, reward range, and determinism under a fixed seed.
"""

import os

import numpy as np
import pytest

from dm_control_tpu import suite

# Every registered task is swept, including the benchmark flagships
# (humanoid walk/run, swimmer15, humanoid_CMU, dog); the persistent
# compilation cache keeps warm runs affordable on 1-core hosts.
# DMC_TPU_FAST_TESTS=1 skips the heaviest compiles for quick local
# iteration. (humanoid_CMU cold-compiles in ~2.5 min and swimmer15 in
# ~1 min since the level-parallel FK/constraint vectorization — they
# are no longer gated.)
_HEAVY = {('humanoid', 'walk'), ('humanoid', 'run'),
          ('humanoid', 'run_pure_state'),
          ('cartpole', 'three_poles'),
          ('humanoid_CMU', 'stand'), ('humanoid_CMU', 'walk'),
          ('humanoid_CMU', 'run'), ('swimmer', 'swimmer15')} | {
              ('dog', t) for t in
              ('stand', 'walk', 'trot', 'run', 'fetch')}
_FAST = bool(os.environ.get('DMC_TPU_FAST_TESTS'))
# heavy-model tasks run in the `heavy` lane (see pytest.ini) so the
# default lane stays within the 1-core host's budget
_ALL = [pytest.param(*t, marks=pytest.mark.heavy) if t in _HEAVY else t
        for t in suite.ALL_TASKS if not (_FAST and t in _HEAVY)]


def _uniform_policy(spec, rng):
  lo = np.where(np.isfinite(spec.minimum), spec.minimum, -1.0)
  hi = np.where(np.isfinite(spec.maximum), spec.maximum, 1.0)
  return rng.uniform(lo, hi, size=spec.shape).astype(np.float32)


@pytest.mark.parametrize('domain,task', _ALL)
def test_task_runs(domain, task):
  env = suite.load(domain, task, task_kwargs={'random': 7})
  spec = env.action_spec()
  obs_spec = env.observation_spec()
  ts = env.reset()
  assert ts.first()
  for key, value in ts.observation.items():
    assert key in obs_spec
    assert tuple(np.shape(value)) == tuple(obs_spec[key].shape)
  rng = np.random.RandomState(1)
  for _ in range(3):
    ts = env.step(_uniform_policy(spec, rng))
    if domain != 'lqr':  # lqr's quadratic reward is unbounded below
      assert 0.0 <= ts.reward <= 1.0 + 1e-6
    assert np.isfinite(ts.reward)
    assert np.isfinite(
        np.concatenate([np.ravel(v) for v in ts.observation.values()])
    ).all()


@pytest.mark.parametrize('domain,task', [('cartpole', 'swingup'),
                                         ('reacher', 'easy')])
def test_deterministic_under_seed(domain, task):
  trajs = []
  for _ in range(2):
    env = suite.load(domain, task, task_kwargs={'random': 123})
    rng = np.random.RandomState(0)
    spec = env.action_spec()
    ts = env.reset()
    obs = [np.concatenate([np.ravel(v) for v in ts.observation.values()])]
    for _ in range(5):
      ts = env.step(_uniform_policy(spec, rng))
      obs.append(np.concatenate(
          [np.ravel(v) for v in ts.observation.values()]))
    trajs.append(np.stack(obs))
  np.testing.assert_array_equal(trajs[0], trajs[1])


def test_initial_state_is_randomized():
  env = suite.load('cartpole', 'swingup', task_kwargs={'random': 42})
  ts1 = env.reset()
  ts2 = env.reset()
  assert not np.allclose(ts1.observation['position'],
                         ts2.observation['position'])


@pytest.mark.parametrize('domain,task', [('cartpole', 'balance'),
                                         ('hopper', 'stand'),
                                         ('reacher', 'easy')])
def test_episode_to_termination_no_constant_observations(domain, task):
  """Run a full episode to its time limit; no observation element may
  stay constant for the whole episode (reference
  suite/suite_test.py:250 contract)."""
  env = suite.load(domain, task, task_kwargs={'random': 99})
  spec = env.action_spec()
  rng = np.random.RandomState(2)
  ts = env.reset()
  flat = [np.concatenate([np.ravel(np.asarray(v, dtype=np.float64))
                          for v in ts.observation.values()])]
  steps = 0
  while not ts.last():
    ts = env.step(_uniform_policy(spec, rng))
    flat.append(np.concatenate(
        [np.ravel(np.asarray(v, dtype=np.float64))
         for v in ts.observation.values()]))
    steps += 1
    assert steps < 2000, 'episode failed to terminate'
  assert ts.discount == 1.0  # time-limit truncation, not termination
  stacked = np.stack(flat)
  variation = stacked.max(axis=0) - stacked.min(axis=0)
  assert np.all(variation > 0), (
      'constant observation elements at indices '
      f'{np.where(variation == 0)[0]}')


def test_benchmarking_tags():
  assert ('cartpole', 'swingup') in suite.BENCHMARKING
  assert ('hopper', 'hop') in suite.BENCHMARKING
  assert len(suite.ALL_TASKS) >= len(suite.BENCHMARKING)
