"""Shared machinery for suite environment wrappers.

All wrappers in this package are thin layers over two reusable pieces:

* `Delegate` — a dm_env.Environment that forwards everything to the
  wrapped env; subclasses override only what they change.
* `ObservationExtender` — a Delegate that appends one extra entry to the
  observation dict, normalizing array-valued observations into a dict
  under `STATE_KEY` first (contract: reference suite/wrappers/pixels.py
  and mujoco_profiling.py observation handling).
"""

from __future__ import annotations

import collections
import collections.abc

import dm_env
from dm_env import specs

STATE_KEY = 'state'


class Delegate(dm_env.Environment):
  """Forwards the full dm_env surface to a wrapped environment."""

  def __init__(self, env):
    self._env = env

  def reset(self):
    return self._env.reset()

  def step(self, action):
    return self._env.step(action)

  def action_spec(self):
    return self._env.action_spec()

  def observation_spec(self):
    return self._env.observation_spec()

  def __getattr__(self, name):
    return getattr(self._env, name)


class ObservationExtender(Delegate):
  """Adds one computed entry to every time step's observation.

  Subclasses implement `_extra_spec()` and `_extra_value()`. With
  `drop_wrapped=True` the wrapped observation is discarded and only the
  extra entry remains (pixels-only mode).
  """

  def __init__(self, env, key, drop_wrapped=False):
    super().__init__(env)
    self._key = key
    self._drop_wrapped = drop_wrapped

    inner = env.observation_spec()
    self._inner_is_dict = isinstance(inner, collections.abc.MutableMapping)
    if not self._inner_is_dict and not isinstance(inner, specs.Array):
      raise ValueError(
          f'Unsupported observation spec structure: {type(inner)}')
    taken = set(inner.keys()) if self._inner_is_dict else {STATE_KEY}
    if not drop_wrapped and key in taken:
      raise ValueError(f'Duplicate or reserved observation key {key!r}.')

  def _wrap_observation(self, inner_obs):
    out = collections.OrderedDict()
    if not self._drop_wrapped:
      if self._inner_is_dict:
        out.update(inner_obs)
      else:
        out[STATE_KEY] = inner_obs
    return out

  def observation_spec(self):
    spec = self._wrap_observation(self._env.observation_spec())
    spec[self._key] = self._extra_spec()
    return spec

  def _extend(self, time_step):
    obs = self._wrap_observation(time_step.observation)
    obs[self._key] = self._extra_value()
    return time_step._replace(observation=obs)

  def reset(self):
    return self._extend(self._env.reset())

  def step(self, action):
    return self._extend(self._env.step(action))

  def _extra_spec(self):
    raise NotImplementedError

  def _extra_value(self):
    raise NotImplementedError
