"""Observation updater: drives per-observable buffers across substeps.

Behavioural counterpart of reference
dm_control/composer/observation/updater.py:32-331: at every physics
substep, observables whose update_interval divides the substep counter
are evaluated and inserted into their buffers with their delay;
`get_observation` reads the buffered (optionally aggregated) values.
"""

from __future__ import annotations

import collections
from typing import Callable, Dict, Optional

import numpy as np
from dm_env import specs

from dm_control_tpu.composer.observation import obs_buffer

DEFAULT_BUFFER_SIZE = 1
DEFAULT_UPDATE_INTERVAL = 1
DEFAULT_DELAY = 0


def _call_if_callable(value, random_state):
  if callable(value):
    return value(random_state)
  return value


class _EnabledObservable:

  def __init__(self, name, observable, physics, random_state,
               strip_singleton_buffer_dim):
    self.name = name
    self.observable = observable
    self.update_callable = observable.observation_callable(
        physics, random_state)
    probe = np.asarray(self.update_callable())
    buffer_size = observable.buffer_size or DEFAULT_BUFFER_SIZE
    self.buffer = obs_buffer.Buffer(
        buffer_size, probe.shape, probe.dtype,
        strip_singleton_buffer_dim=strip_singleton_buffer_dim)

  def spec(self):
    return specs.Array(self.buffer.shape, self.buffer.dtype,
                       name=self.name)


class Updater:
  """Evaluates enabled observables on a schedule and buffers them."""

  def __init__(self, observables,
               physics_steps_per_control_step: int = 1,
               strip_singleton_obs_buffer_dim: bool = False):
    """`observables`: a dict of observables, or a LIST of dicts for
    multi-agent tasks (reference updater.py supports both structures —
    soccer returns one dict per player)."""
    self._multi_agent = isinstance(observables, (list, tuple))
    self._observables = observables
    self._n_sub_steps = physics_steps_per_control_step
    self._strip = strip_singleton_obs_buffer_dim
    self._enabled = []
    self._enabled_groups = []
    self._step_counter = 0

  def reset(self, physics, random_state) -> None:
    self._step_counter = 0
    groups = (self._observables if self._multi_agent
              else [self._observables])
    self._enabled_groups = [
        [_EnabledObservable(name, obs, physics, random_state,
                            self._strip)
         for name, obs in group.items() if obs.enabled]
        for group in groups]
    self._enabled = [e for group in self._enabled_groups for e in group]
    # initial observation fills the buffers
    for e in self._enabled:
      delay = _call_if_callable(e.observable.delay or 0, random_state)
      e.buffer.insert(0, delay, e.update_callable())
    self._random_state = random_state

  @property
  def has_enabled(self) -> bool:
    """Whether reset() has populated the enabled-observable list."""
    return bool(self._enabled)

  def observation_spec(self):
    if self._multi_agent:
      return [collections.OrderedDict((e.name, e.spec()) for e in group)
              for group in self._enabled_groups]
    return collections.OrderedDict(
        (e.name, e.spec()) for e in self._enabled)

  def prepare_for_next_control_step(self) -> None:
    pass  # scheduling is computed on the fly in update()

  def update(self) -> None:
    """Called after every physics substep."""
    self._step_counter += 1
    rs = self._random_state
    for e in self._enabled:
      interval = _call_if_callable(
          e.observable.update_interval or DEFAULT_UPDATE_INTERVAL, rs)
      if self._step_counter % int(interval) == 0:
        delay = _call_if_callable(e.observable.delay or 0, rs)
        e.buffer.insert(self._step_counter, delay,
                        e.update_callable())

  def _read_one(self, e):
    value = e.buffer.read(self._step_counter)
    if e.observable.aggregator is not None:
      value = e.observable.aggregator(np.atleast_1d(value))
    return value

  def get_observation(self):
    if self._multi_agent:
      return [collections.OrderedDict(
          (e.name, self._read_one(e)) for e in group)
              for group in self._enabled_groups]
    return collections.OrderedDict(
        (e.name, self._read_one(e)) for e in self._enabled)
