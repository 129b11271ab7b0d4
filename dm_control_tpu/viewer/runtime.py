"""Viewer runtime state machine
(behavioural counterpart of reference
dm_control/viewer/runtime.py:76-260): drives an environment + optional
policy through START/RUNNING/STOP/STOPPED/RESTARTING states, tracking
simulation vs wall-clock time.
"""

import collections.abc
import copy
import enum

import numpy as np

from dm_control_tpu.viewer import util

_DEFAULT_MAX_SIM_STEP = 1. / 5.


def _get_default_action(action_spec):
  """Midpoint of closed intervals; bound for half-open; 0 unbounded."""
  if isinstance(action_spec, (list, tuple)):
    return tuple(_get_default_action(spec) for spec in action_spec)
  elif isinstance(action_spec, collections.abc.MutableMapping):
    result = copy.copy(action_spec)
    for key, value in action_spec.items():
      result[key] = _get_default_action(value)
    return result
  minimum = np.broadcast_to(action_spec.minimum, action_spec.shape)
  maximum = np.broadcast_to(action_spec.maximum, action_spec.shape)
  left_bounded = np.isfinite(minimum)
  right_bounded = np.isfinite(maximum)
  action = np.select(
      condlist=[left_bounded & right_bounded, left_bounded,
                right_bounded],
      choicelist=[0.5 * (minimum + maximum), minimum, maximum],
      default=0.)
  action = action.astype(action_spec.dtype, copy=False)
  action.flags.writeable = False
  return action


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

  def tick(self, time_elapsed, paused):
    """Advances the simulation for one rendered frame."""
    with self._simulation_timer.measure_time():
      if self._state == State.RESTARTING:
        self._state = State.START
      if self._state == State.START:
        if self._start():
          self._broadcast_episode_start()
          self._tracked_simulation_time = self.get_time()
          self._state = State.RUNNING
        else:
          self._state = State.STOPPED
      if self._state == State.RUNNING:
        finished = self._step_simulation(time_elapsed, paused)
        if finished:
          self._state = State.STOP
      if self._state == State.STOP:
        self._state = State.STOPPED

  def _step_simulation(self, time_elapsed, paused):
    finished = False
    if paused:
      self._step_paused()
    else:
      step_duration = min(time_elapsed, self.simulation_time_budget)
      actual_simulation_time = self.get_time()
      if self._tracked_simulation_time >= actual_simulation_time:
        end_time = actual_simulation_time + step_duration
        while not finished and self.get_time() < end_time:
          finished = self._step()
      self._tracked_simulation_time += step_duration
    return finished

  def single_step(self):
    if self._state == State.RUNNING:
      finished = self._step()
      self._state = State.STOP if finished else State.RUNNING

  def stop(self):
    self._state = State.STOPPED

  def restart(self):
    if self._state != State.STOPPED:
      self._state = State.RESTARTING
    else:
      self._state = State.START

  def get_time(self):
    return float(self._env.physics.time())

  @property
  def environment(self):
    return self._env

  @property
  def state(self):
    return self._state

  @property
  def simulation_time(self):
    return self._simulation_timer.measured_time

  @property
  def last_action(self):
    return self._last_action

  def _broadcast_episode_start(self):
    for listener in self.on_episode_begin:
      listener()

  def _start(self):
    # physics identity may change across resets (composer recompiles
    # per episode): detect and notify, as the reference does via the
    # mjData pointer
    old_physics = getattr(self._env, 'physics', None)
    old_data = getattr(old_physics, 'data', None)
    with self._error_logger:
      self._time_step = self._env.reset()
    new_data = getattr(getattr(self._env, 'physics', None), 'data', None)
    if new_data is not old_data:
      for listener in self.on_physics_changed:
        listener()
    return not self._error_logger.errors_found

  def _step_paused(self):
    self._env.physics.forward()

  def _step(self):
    finished = True
    with self._error_logger:
      if self._policy:
        action = self._policy(self._time_step)
      else:
        action = self._default_action
      self._time_step = self._env.step(action)
      self._last_action = action
      finished = self._time_step.last()
    return finished or self._error_logger.errors_found
