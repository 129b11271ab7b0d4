"""Step-timing observation wrapper
(reference suite/wrappers/mujoco_profiling.py:30-107).

The reference surfaces MuJoCo's internal step timer; the TPU build has
no C timer callbacks, so the wrapper measures the wall-clock duration
of each (jitted, device-synchronized) `env.step` call — the same
"profiling as an observation" contract: obs[key] = [duration_seconds,
number_of_steps].
"""

import collections
import time

import dm_env
from dm_env import specs
import numpy as np

STATE_KEY = 'state'


class Wrapper(dm_env.Environment):
  """Adds a step-timing observation to a control environment."""

  def __init__(self, env, observation_key='step_timing'):
    wrapped_observation_spec = env.observation_spec()
    if isinstance(wrapped_observation_spec, specs.Array):
      self._observation_is_dict = False
      invalid_keys = set([STATE_KEY])
    elif isinstance(wrapped_observation_spec,
                    collections.abc.MutableMapping):
      self._observation_is_dict = True
      invalid_keys = set(wrapped_observation_spec.keys())
    else:
      raise ValueError('Unsupported observation spec structure.')
    if observation_key in invalid_keys:
      raise ValueError(
          f'Duplicate or reserved observation key {observation_key!r}.')

    if self._observation_is_dict:
      self._observation_spec = wrapped_observation_spec.copy()
    else:
      self._observation_spec = collections.OrderedDict()
      self._observation_spec[STATE_KEY] = wrapped_observation_spec
    self._observation_spec[observation_key] = specs.Array(
        shape=(2,), dtype=np.double, name=observation_key)

    self._env = env
    self._observation_key = observation_key
    self._n_steps = 0
    self._last_duration = 0.0

  def reset(self):
    self._n_steps = 0
    self._last_duration = 0.0
    return self._add_profile_observation(self._env.reset())

  def step(self, action):
    t0 = time.perf_counter()
    time_step = self._env.step(action)
    self._last_duration = time.perf_counter() - t0
    self._n_steps += 1
    return self._add_profile_observation(time_step)

  def observation_spec(self):
    return self._observation_spec

  def action_spec(self):
    return self._env.action_spec()

  def _add_profile_observation(self, time_step):
    if self._observation_is_dict:
      observation = type(time_step.observation)(time_step.observation)
    else:
      observation = collections.OrderedDict()
      observation[STATE_KEY] = time_step.observation
    observation[self._observation_key] = np.array(
        [self._last_duration, self._n_steps], dtype=np.double)
    return time_step._replace(observation=observation)

  def __getattr__(self, name):
    return getattr(self._env, name)
