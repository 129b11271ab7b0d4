"""Composer Task base class.

Behavioural counterpart of reference dm_control/composer/task.py:26-322:
timestep plumbing with divisibility checks, default action spec from
actuators, the reward/discount/termination contract, and NullTask.
"""

from __future__ import annotations

import abc
import collections
from typing import Optional

import numpy as np
from dm_env import specs

_DEFAULT_PHYSICS_TIMESTEP = 0.002


def _check_timesteps_divisible(control_timestep, physics_timestep):
  num_steps = control_timestep / physics_timestep
  rounded = round(num_steps)
  if abs(num_steps - rounded) > 1e-6 * rounded:
    raise ValueError(
        f'control timestep ({control_timestep}) must be an integer '
        f'multiple of the physics timestep ({physics_timestep})')
  return int(rounded)


class Task(abc.ABC):
  """Base class for composer tasks."""

  _physics_timestep = _DEFAULT_PHYSICS_TIMESTEP
  _control_timestep = _DEFAULT_PHYSICS_TIMESTEP

  @property
  @abc.abstractmethod
  def root_entity(self):
    """The arena / root Entity of the scene."""

  def iter_entities(self):
    return self.root_entity.iter_entities()

  # ---------------- timesteps ----------------
  @property
  def physics_timestep(self):
    return self._physics_timestep

  @physics_timestep.setter
  def physics_timestep(self, value):
    _check_timesteps_divisible(self._control_timestep, value)
    self._physics_timestep = value
    self.root_entity.mjcf_model.option.timestep = value

  @property
  def control_timestep(self):
    return self._control_timestep

  @control_timestep.setter
  def control_timestep(self, value):
    _check_timesteps_divisible(value, self._physics_timestep)
    self._control_timestep = value

  def set_timesteps(self, control_timestep, physics_timestep):
    _check_timesteps_divisible(control_timestep, physics_timestep)
    self._physics_timestep = physics_timestep
    self._control_timestep = control_timestep
    self.root_entity.mjcf_model.option.timestep = physics_timestep

  @property
  def physics_steps_per_control_step(self):
    return _check_timesteps_divisible(self._control_timestep,
                                      self._physics_timestep)

  # ---------------- observables ----------------
  @property
  def observables(self):
    out = collections.OrderedDict()
    for entity in self.iter_entities():
      out.update(entity.observables.as_dict())
    out.update(self.task_observables)
    return out

  @property
  def task_observables(self):
    return collections.OrderedDict()

  # ---------------- action spec ----------------
  def action_spec(self, physics):
    """Bounded spec over all actuators (task.py:178-196 parity)."""
    model = physics.model
    names = [model.names.id2name('actuator', i) or str(i)
             for i in range(model.nu)]
    limited = np.array(model.actuator_ctrllimited, dtype=bool)
    rng = np.asarray(model.actuator_ctrlrange, dtype=np.float64)
    minima = np.where(limited, rng[:, 0], -np.inf)
    maxima = np.where(limited, rng[:, 1], np.inf)
    return specs.BoundedArray(
        shape=(model.nu,), dtype=np.float64, minimum=minima,
        maximum=maxima, name='\t'.join(names) if names else None)

  def before_step(self, physics, action, random_state):
    physics.set_control(action)

  # lifecycle hooks
  def initialize_episode_mjcf(self, random_state):
    pass

  def after_compile(self, physics, random_state):
    pass

  def initialize_episode(self, physics, random_state):
    pass

  def before_substep(self, physics, action, random_state):
    pass

  def after_substep(self, physics, random_state):
    pass

  def after_step(self, physics, random_state):
    pass

  # ---------------- RL contract ----------------
  @abc.abstractmethod
  def get_reward(self, physics):
    """Returns the scalar reward."""

  def get_reward_spec(self):
    return None

  def get_discount(self, physics):
    return 1.0

  def get_discount_spec(self):
    return None

  def should_terminate_episode(self, physics):
    return False


class NullTask(Task):
  """A do-nothing task wrapping a single root entity."""

  def __init__(self, root_entity):
    self._root_entity = root_entity

  @property
  def root_entity(self):
    return self._root_entity

  def get_reward(self, physics):
    return 0.0
