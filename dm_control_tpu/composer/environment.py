"""Composer Environment: hook engine + per-episode recompilation.

Behavioural counterpart of reference
dm_control/composer/environment.py:74-465: the seven-hook lifecycle
(initialize_episode_mjcf -> compile -> after_compile ->
initialize_episode; before_step -> [before_substep -> physics.step ->
after_substep -> observation update]*N -> after_step), physics
divergence converted to termination with discount 0, and retried
episode initialization.
"""

from __future__ import annotations

import logging
from typing import Optional

import dm_env
import numpy as np

from dm_control_tpu import mjcf
from dm_control_tpu.composer.observation import updater as updater_lib
from dm_control_tpu.mujoco import engine as engine_lib

_log = logging.getLogger('dm_control_tpu.composer')

HOOK_NAMES = ('initialize_episode_mjcf', 'after_compile',
              'initialize_episode', 'before_step', 'before_substep',
              'after_substep', 'after_step')

_MAX_RESET_ATTEMPTS = 100


class EpisodeInitializationError(RuntimeError):
  pass


class _Hooks:
  """Dispatches one hook across task + all entities."""

  def __init__(self, task):
    self._task = task

  def __call__(self, name, *args, task_args=None):
    """Invoke hook `name` on the task then every entity. The task may
    receive different arguments (reference: task.before_substep gets
    the action, entities do not — environment.py:143-147)."""
    getattr(self._task, name)(*(task_args if task_args is not None
                                else args))
    for entity in self._task.iter_entities():
      getattr(entity, name)(*args)


class Environment(dm_env.Environment):
  """dm_env.Environment over a composer Task."""

  def __init__(self, task, time_limit=float('inf'), random_state=None,
               n_sub_steps=None,
               raise_exception_on_physics_error: bool = True,
               strip_singleton_obs_buffer_dim: bool = False,
               max_reset_attempts: int = 1,
               recompile_mjcf_every_episode: bool = True):
    self._task = task
    self._time_limit = time_limit
    self._raise_on_error = raise_exception_on_physics_error
    self._strip = strip_singleton_obs_buffer_dim
    self._max_reset_attempts = max_reset_attempts
    self._recompile_every_episode = recompile_mjcf_every_episode
    if random_state is None or isinstance(random_state, int):
      random_state = np.random.RandomState(random_state)
    self._random_state = random_state
    self._hooks = _Hooks(task)
    self._physics: Optional[mjcf.Physics] = None
    self._observation_updater = None
    self._reset_next_step = True
    self._recompile_physics()

  # ------------------------------------------------------------------
  @property
  def physics(self):
    return self._physics

  @property
  def task(self):
    return self._task

  @property
  def random_state(self):
    return self._random_state

  def control_timestep(self):
    return self._task.control_timestep

  # ------------------------------------------------------------------
  def _recompile_physics(self):
    self._physics = mjcf.Physics.from_mjcf_model(
        self._task.root_entity.mjcf_model)
    self._observation_updater = updater_lib.Updater(
        self._task.observables,
        self._task.physics_steps_per_control_step,
        self._strip)

  def reset(self) -> dm_env.TimeStep:
    self._episode_count = getattr(self, '_episode_count', 0) + 1
    _log.debug('composer episode %d: reset', self._episode_count)
    failures = 0
    while True:
      try:
        return self._reset_attempt()
      except EpisodeInitializationError as e:
        failures += 1
        _log.warning('episode initialization failed (%d/%d): %s',
                     failures, self._max_reset_attempts, e)
        if failures >= self._max_reset_attempts:
          raise e

  def _reset_attempt(self):
    self._hooks('initialize_episode_mjcf', self._random_state)
    if self._recompile_every_episode or self._physics is None:
      self._recompile_physics()
    self._hooks('after_compile', self._physics, self._random_state)
    with self._physics.reset_context():
      self._hooks('initialize_episode', self._physics,
                  self._random_state)
    self._observation_updater.reset(self._physics, self._random_state)
    self._reset_next_step = False
    self._step_count = 0
    return dm_env.TimeStep(
        step_type=dm_env.StepType.FIRST, reward=None, discount=None,
        observation=self._observation_updater.get_observation())

  def step(self, action) -> dm_env.TimeStep:
    if self._reset_next_step:
      return self.reset()
    task = self._task
    physics = self._physics
    rs = self._random_state

    task.before_step(physics, action, rs)
    for entity in task.iter_entities():
      entity.before_step(physics, rs)

    failed = False
    n_sub = task.physics_steps_per_control_step
    try:
      for i in range(n_sub):
        self._hooks('before_substep', physics, rs,
                    task_args=(physics, action, rs))
        physics.step()
        self._hooks('after_substep', physics, rs)
        if i < n_sub - 1:
          self._observation_updater.update()
    except engine_lib.PhysicsError:
      if self._raise_on_error:
        raise
      _log.warning('composer episode %d: physics diverged at step %d; '
                   'terminating with discount 0',
                   getattr(self, '_episode_count', 0), self._step_count)
      failed = True

    # after_step hooks and the final observation update run even on a
    # divergent physics step (reference environment.py:438-439 places
    # them after the except block).
    task.after_step(physics, rs)
    for entity in task.iter_entities():
      entity.after_step(physics, rs)
    self._observation_updater.update()

    self._step_count += 1
    obs = self._observation_updater.get_observation()
    if failed:
      self._reset_next_step = True
      return dm_env.TimeStep(dm_env.StepType.LAST, 0.0, 0.0, obs)

    # Reward AND discount are consulted on every step — MID steps carry
    # task.get_discount(), not a hardcoded 1.0 (reference
    # environment.py:443-456).
    reward = task.get_reward(physics)
    discount = task.get_discount(physics)
    terminating = (task.should_terminate_episode(physics)
                   or physics.time() >= self._time_limit)
    if terminating:
      self._reset_next_step = True
      return dm_env.TimeStep(dm_env.StepType.LAST, reward, discount,
                             obs)
    return dm_env.TimeStep(dm_env.StepType.MID, reward, discount, obs)

  # ------------------------------------------------------------------
  def action_spec(self):
    return self._task.action_spec(self._physics)

  def observation_spec(self):
    if not self._observation_updater.has_enabled:
      # probe once to populate
      self._observation_updater.reset(self._physics,
                                      self._random_state)
    return self._observation_updater.observation_spec()

  def reward_spec(self):
    spec = self._task.get_reward_spec()
    if spec is not None:
      return spec
    return super().reward_spec()

  def discount_spec(self):
    spec = self._task.get_discount_spec()
    if spec is not None:
      return spec
    return super().discount_spec()
