"""Suite wrapper behavior: pixels, action_noise, action_scale,
mujoco_profiling (contracts: reference suite/wrappers/*)."""

import numpy as np
import pytest

from dm_control_tpu import suite
from dm_control_tpu.suite.wrappers import (action_noise, action_scale,
                                           mujoco_profiling, pixels)


@pytest.fixture(scope='module')
def cartpole():
  return suite.load('cartpole', 'balance', task_kwargs={'random': 0})


def test_pixels_only(cartpole):
  env = pixels.Wrapper(cartpole, pixels_only=True,
                       render_kwargs={'height': 16, 'width': 16})
  spec = env.observation_spec()
  assert list(spec) == ['pixels']
  assert spec['pixels'].shape == (16, 16, 3)
  ts = env.reset()
  assert list(ts.observation) == ['pixels']
  assert ts.observation['pixels'].shape == (16, 16, 3)


def test_pixels_alongside_state(cartpole):
  env = pixels.Wrapper(cartpole, pixels_only=False,
                       render_kwargs={'height': 8, 'width': 8})
  ts = env.reset()
  assert 'pixels' in ts.observation and 'position' in ts.observation
  ts = env.step(np.zeros(env.action_spec().shape))
  assert ts.observation['pixels'].shape == (8, 8, 3)


def test_pixels_rejects_duplicate_key(cartpole):
  with pytest.raises(ValueError):
    pixels.Wrapper(cartpole, pixels_only=False, observation_key='position',
                   render_kwargs={'height': 8, 'width': 8})


def test_action_noise_perturbs_within_bounds(cartpole):
  env = action_noise.Wrapper(cartpole, scale=0.5,
                             random_state=np.random.RandomState(0))
  env.reset()
  ts = env.step(np.zeros(env.action_spec().shape))
  assert ts.reward is not None


def test_action_scale_affine_map(cartpole):
  env = action_scale.Wrapper(cartpole, minimum=0.0, maximum=1.0)
  spec = env.action_spec()
  np.testing.assert_array_equal(spec.minimum, 0.0)
  np.testing.assert_array_equal(spec.maximum, 1.0)
  env.reset()
  env.step(np.full(spec.shape, 0.5))  # mid-range -> native mid-range


def test_profiling_observation(cartpole):
  env = mujoco_profiling.Wrapper(cartpole)
  ts = env.reset()
  np.testing.assert_array_equal(ts.observation['step_timing'], [0.0, 0.0])
  ts = env.step(np.zeros(env.action_spec().shape))
  timing = ts.observation['step_timing']
  assert timing[0] > 0.0 and timing[1] == 1
