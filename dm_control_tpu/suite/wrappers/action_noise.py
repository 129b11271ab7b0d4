"""Gaussian action-noise wrapper (contract: reference
suite/wrappers/action_noise.py — i.i.d. noise scaled by the action
range, clipped back into bounds)."""

from __future__ import annotations

import numpy as np

from dm_control_tpu.suite.wrappers import _base


class Wrapper(_base.Delegate):
  """Perturbs every action with zero-mean Gaussian noise."""

  def __init__(self, env, scale: float = 0.01, random_state=None):
    super().__init__(env)
    bounds = env.action_spec()
    lo, hi = np.asarray(bounds.minimum), np.asarray(bounds.maximum)
    if not np.isfinite([lo, hi]).all():
      raise ValueError('action spec must be bounded')
    self._lo, self._hi = lo, hi
    self._sigma = scale * (hi - lo)
    self._rng = random_state if random_state is not None \
        else np.random.RandomState()

  def step(self, action):
    jittered = np.asarray(action) + self._rng.normal(scale=self._sigma)
    return self._env.step(np.clip(jittered, self._lo, self._hi))
