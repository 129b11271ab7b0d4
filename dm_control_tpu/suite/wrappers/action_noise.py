"""Adds i.i.d. Gaussian action noise (behavioural parity: reference
suite/wrappers/action_noise.py)."""

from __future__ import annotations

import dm_env
import numpy as np


class Wrapper(dm_env.Environment):
  """Adds scaled Gaussian noise to actions before stepping."""

  def __init__(self, env, scale: float = 0.01, random_state=None):
    spec = env.action_spec()
    if not (np.isfinite(spec.minimum).all() and
            np.isfinite(spec.maximum).all()):
      raise ValueError('action spec must be bounded')
    self._minimum = spec.minimum
    self._maximum = spec.maximum
    self._noise_std = scale * (spec.maximum - spec.minimum)
    self._env = env
    self._random_state = random_state or np.random.RandomState()

  def step(self, action):
    noisy = action + self._random_state.normal(
        scale=self._noise_std)
    noisy = np.clip(noisy, self._minimum, self._maximum)
    return self._env.step(noisy)

  def reset(self):
    return self._env.reset()

  def observation_spec(self):
    return self._env.observation_spec()

  def action_spec(self):
    return self._env.action_spec()

  def __getattr__(self, name):
    return getattr(self._env, name)
