"""Rescales actions (behavioural parity: reference
suite/wrappers/action_scale.py:30-103)."""

from __future__ import annotations

import dm_env
from dm_env import specs
import numpy as np


class Wrapper(dm_env.Environment):
  """Affinely maps actions from [minimum, maximum] onto the env's spec."""

  def __init__(self, env, minimum, maximum):
    spec = env.action_spec()
    minimum = np.broadcast_to(minimum, spec.shape).astype(spec.dtype)
    maximum = np.broadcast_to(maximum, spec.shape).astype(spec.dtype)
    if not (np.isfinite(minimum).all() and np.isfinite(maximum).all()):
      raise ValueError('minimum and maximum must be finite')
    orig_min = spec.minimum
    orig_max = spec.maximum
    scale = (orig_max - orig_min) / (maximum - minimum)
    offset = orig_min - scale * minimum

    def transform(action):
      new_action = scale * np.asarray(action) + offset
      return new_action.astype(spec.dtype)

    self._env = env
    self._transform = transform
    self._action_spec = specs.BoundedArray(
        shape=spec.shape, dtype=spec.dtype, minimum=minimum,
        maximum=maximum, name=spec.name)

  def step(self, action):
    return self._env.step(self._transform(action))

  def reset(self):
    return self._env.reset()

  def observation_spec(self):
    return self._env.observation_spec()

  def action_spec(self):
    return self._action_spec

  def __getattr__(self, name):
    return getattr(self._env, name)
