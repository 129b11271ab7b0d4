"""Action-rescaling wrapper (contract: reference
suite/wrappers/action_scale.py — affine map from a user-chosen action
box onto the wrapped env's native bounds)."""

from __future__ import annotations

from dm_env import specs
import numpy as np

from dm_control_tpu.suite.wrappers import _base


class Wrapper(_base.Delegate):
  """Exposes [minimum, maximum] to the agent, maps onto the env's box."""

  def __init__(self, env, minimum, maximum):
    super().__init__(env)
    native = env.action_spec()
    lo = np.broadcast_to(minimum, native.shape).astype(native.dtype)
    hi = np.broadcast_to(maximum, native.shape).astype(native.dtype)
    if not np.isfinite([lo, hi]).all():
      raise ValueError('minimum and maximum must be finite')
    self._gain = (native.maximum - native.minimum) / (hi - lo)
    self._bias = native.minimum - self._gain * lo
    self._dtype = native.dtype
    self._spec = specs.BoundedArray(
        shape=native.shape, dtype=native.dtype, minimum=lo, maximum=hi,
        name=native.name)

  def action_spec(self):
    return self._spec

  def step(self, action):
    native_action = self._gain * np.asarray(action) + self._bias
    return self._env.step(native_action.astype(self._dtype))
