"""Step-timing observation wrapper (contract: reference
suite/wrappers/mujoco_profiling.py — physics timing surfaced as an
observation).

The reference reads MuJoCo's internal timers; on TPU the equivalent
observable cost is the wall-clock of the device-synchronized step, so
obs[key] = [seconds_of_last_step, steps_this_episode].
"""

import time

from dm_env import specs
import numpy as np

from dm_control_tpu.suite.wrappers import _base

STATE_KEY = _base.STATE_KEY


class Wrapper(_base.ObservationExtender):
  """Appends [last step duration (s), step count] to the observation."""

  def __init__(self, env, observation_key='step_timing'):
    super().__init__(env, key=observation_key)
    self._timing = np.zeros(2)

  def _extra_spec(self):
    return specs.Array(shape=(2,), dtype=np.double, name=self._key)

  def _extra_value(self):
    return self._timing.copy()

  def reset(self):
    self._timing[:] = 0.0
    return super().reset()

  def step(self, action):
    started = time.perf_counter()
    time_step = self._env.step(action)
    self._timing[0] = time.perf_counter() - started
    self._timing[1] += 1
    return self._extend(time_step)
