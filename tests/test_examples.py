"""locomotion/examples: every prebuilt env loads, resets, and steps.

Model: reference locomotion/examples/examples_test.py — the canonical
"it all composes" sweep across walkers x arenas x tasks.
"""

import numpy as np
import pytest

from dm_control_tpu.locomotion import examples

_FAST_FACTORIES = [
    'cmu_humanoid_go_to_target',
]
_HEAVY_FACTORIES = [
    'cmu_humanoid_run_walls',
    'cmu_humanoid_run_gaps',
    'cmu_humanoid_maze_forage',
    'rodent_escape_bowl',
    'rodent_run_gaps',
    'rodent_maze_forage',
    'rodent_two_touch',
]


def _run_episode(factory_name):
  env = getattr(examples, factory_name)(random_state=7)
  ts = env.reset()
  assert ts.first()
  spec = env.action_spec()
  for _ in range(2):
    ts = env.step(np.zeros(spec.shape, spec.dtype))
    assert np.isfinite(ts.reward)


@pytest.mark.parametrize('factory_name', _FAST_FACTORIES)
def test_example_env_steps(factory_name):
  _run_episode(factory_name)


@pytest.mark.heavy
@pytest.mark.parametrize('factory_name', _HEAVY_FACTORIES)
def test_example_env_steps_heavy(factory_name):
  _run_episode(factory_name)


@pytest.mark.heavy
def test_cmu_tracking_example():
  try:
    env = examples.cmu_humanoid_tracking(random_state=3)
  except FileNotFoundError:
    pytest.skip('CMU mocap h5 data not provided in this image')
  ts = env.reset()
  spec = env.action_spec()
  ts = env.step(np.zeros(spec.shape, spec.dtype))
  assert np.isfinite(ts.reward)
