"""Viewer runtime state machine.

Behavioral contract: reference viewer/runtime.py — drive an
environment + optional policy through START/RUNNING/STOP/STOPPED/
RESTARTING states, budgeting simulation time against wall-clock.
Restructured: per-state transition handlers dispatched from a table,
and default-action synthesis as a spec-tree map.
"""

import collections.abc
import copy
import enum

import numpy as np

from dm_control_tpu.viewer import util

_DEFAULT_MAX_SIM_STEP = 1. / 5.


def _midpoint_action(spec):
  """One leaf: midpoint of closed ranges, the finite bound of
  half-open ones, zero when unbounded. Read-only array."""
  lo = np.broadcast_to(spec.minimum, spec.shape)
  hi = np.broadcast_to(spec.maximum, spec.shape)
  has_lo, has_hi = np.isfinite(lo), np.isfinite(hi)
  out = np.where(has_lo & has_hi, 0.5 * (lo + hi),
                 np.where(has_lo, lo, np.where(has_hi, hi, 0.)))
  out = out.astype(spec.dtype, copy=False)
  out.flags.writeable = False
  return out


def _get_default_action(spec):
  """Maps _midpoint_action over a (possibly nested) action spec."""
  if isinstance(spec, (list, tuple)):
    return tuple(_get_default_action(s) for s in spec)
  if isinstance(spec, collections.abc.MutableMapping):
    out = copy.copy(spec)
    out.update((k, _get_default_action(v)) for k, v in spec.items())
    return out
  return _midpoint_action(spec)


class State(enum.Enum):
  """State of the Runtime class."""
  START = 0
  RUNNING = 1
  STOP = 2
  STOPPED = 3
  RESTARTING = 4


class Runtime:
  """Drives an environment/policy pair for interactive playback."""

  def __init__(self, environment, policy=None):
    self.on_error = util.QuietSet()
    self.on_episode_begin = util.QuietSet()
    self.on_physics_changed = util.QuietSet()
    self.simulation_time_budget = _DEFAULT_MAX_SIM_STEP

    self._state = State.START
    self._simulation_timer = util.Timer()
    self._tracked_simulation_time = 0.0
    self._error_logger = util.ErrorLogger(self.on_error)

    self._env = environment
    self._policy = policy
    self._default_action = _get_default_action(
        environment.action_spec())
    self._time_step = None
    self._last_action = None

  environment = property(lambda self: self._env)
  state = property(lambda self: self._state)
  last_action = property(lambda self: self._last_action)
  simulation_time = property(
      lambda self: self._simulation_timer.measured_time)

  def get_time(self):
    return float(self._env.physics.time())

  # ------------------------------------------------ state handlers

  def _on_start(self, time_elapsed, paused):
    if self._begin_episode():
      for listener in self.on_episode_begin:
        listener()
      self._tracked_simulation_time = self.get_time()
      return State.RUNNING
    return State.STOPPED

  def _on_running(self, time_elapsed, paused):
    if paused:
      self._env.physics.forward()
      return State.RUNNING
    # advance sim until it catches up with (budgeted) wall-clock
    budget = min(time_elapsed, self.simulation_time_budget)
    now = self.get_time()
    done = False
    if self._tracked_simulation_time >= now:
      deadline = now + budget
      while not done and self.get_time() < deadline:
        done = self._advance()
    self._tracked_simulation_time += budget
    return State.STOP if done else State.RUNNING

  _HANDLERS = {
      State.START: _on_start,
      State.RUNNING: _on_running,
      State.STOP: lambda self, t, p: State.STOPPED,
  }

  def tick(self, time_elapsed, paused):
    """Advances the simulation for one rendered frame."""
    with self._simulation_timer.measure_time():
      if self._state == State.RESTARTING:
        self._state = State.START
      # a single tick may ripple through several states (START ->
      # RUNNING -> STOP); run handlers until the state settles
      while True:
        handler = self._HANDLERS.get(self._state)
        if handler is None:
          break
        next_state = handler(self, time_elapsed, paused)
        settled = next_state == self._state
        self._state = next_state
        if settled:
          break

  def single_step(self):
    if self._state == State.RUNNING:
      done = self._advance()
      self._state = State.STOP if done else State.RUNNING

  def stop(self):
    self._state = State.STOPPED

  def restart(self):
    self._state = (State.START if self._state == State.STOPPED
                   else State.RESTARTING)

  # ------------------------------------------------ env plumbing

  def _begin_episode(self):
    # physics identity may change across resets (composer recompiles
    # per episode): detect and notify, as the reference does via the
    # mjData pointer
    old_data = getattr(getattr(self._env, 'physics', None), 'data',
                       None)
    with self._error_logger:
      self._time_step = self._env.reset()
    new_data = getattr(getattr(self._env, 'physics', None), 'data',
                       None)
    if new_data is not old_data:
      for listener in self.on_physics_changed:
        listener()
    return not self._error_logger.errors_found

  def _advance(self):
    """One env step; True when the episode (or an error) ended it."""
    done = True
    with self._error_logger:
      action = (self._policy(self._time_step) if self._policy
                else self._default_action)
      self._time_step = self._env.step(action)
      self._last_action = action
      done = self._time_step.last()
    return done or self._error_logger.errors_found
