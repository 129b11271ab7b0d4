"""Go-to-target task (reference locomotion/tasks/go_to_target.py:25-220).

A walker is rewarded for standing within `distance_tolerance` of a
target site; with `moving_target` the target relocates after the walker
has collected reward for `steps_before_moving_target` steps.
"""

from __future__ import annotations

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu.composer.observation import observable
from dm_control_tpu.composer.variation import distributions
from dm_control_tpu.composer.variation import variation_values as variation

DEFAULT_DISTANCE_TOLERANCE_TO_TARGET = 1.0


class GoToTarget(composer.Task):
  """Move the walker to a (possibly moving) target."""

  def __init__(self,
               walker,
               arena,
               moving_target=False,
               target_relative=False,
               target_relative_dist=1.5,
               steps_before_moving_target=10,
               distance_tolerance=DEFAULT_DISTANCE_TOLERANCE_TO_TARGET,
               target_spawn_position=None,
               walker_spawn_position=None,
               walker_spawn_rotation=None,
               physics_timestep=0.005,
               control_timestep=0.025):
    self._arena = arena
    self._walker = walker
    walker.create_root_joints(self._arena.attach(walker))

    arena_position = distributions.Uniform(
        low=-np.array(arena.size) / 2, high=np.array(arena.size) / 2)
    self._target_spawn_position = (
        target_spawn_position if target_spawn_position is not None
        else arena_position)
    self._walker_spawn_position = (
        walker_spawn_position if walker_spawn_position is not None
        else arena_position)
    self._walker_spawn_rotation = walker_spawn_rotation

    self._distance_tolerance = distance_tolerance
    self._moving_target = moving_target
    self._target_relative = target_relative
    self._target_relative_dist = target_relative_dist
    self._steps_before_moving_target = steps_before_moving_target
    self._reward_step_counter = 0

    self._target = self.root_entity.mjcf_model.worldbody.add(
        'site', name='target', type='sphere', pos=(0., 0., 0.),
        size=(0.1,), rgba=(0.9, 0.6, 0.6, 1.0))

    walker.observables.enable_proprioception()
    for obs in walker.observables.kinematic_sensors:
      obs.enabled = True

    self.set_timesteps(control_timestep, physics_timestep)

  @property
  def root_entity(self):
    return self._arena

  def target_position(self, physics):
    return np.array(physics.bind(self._target).pos)

  def initialize_episode_mjcf(self, random_state):
    self._arena.regenerate(random_state=random_state)
    target_x, target_y = variation.evaluate(
        self._target_spawn_position, random_state=random_state)
    self._target.pos = [target_x, target_y, 0.]

  def initialize_episode(self, physics, random_state):
    if self._walker_spawn_rotation is not None:
      rotation = variation.evaluate(
          self._walker_spawn_rotation, random_state=random_state)
      quat = [np.cos(rotation / 2), 0, 0, np.sin(rotation / 2)]
    else:
      quat = None
    walker_x, walker_y = variation.evaluate(
        self._walker_spawn_position, random_state=random_state)
    self._walker.set_pose(
        physics, position=[walker_x, walker_y, 0.06],
        quaternion=quat)
    self._reward_step_counter = 0
    self._failure_termination = False

  def should_terminate_episode(self, physics):
    return self._failure_termination

  def get_discount(self, physics):
    return 0.0 if self._failure_termination else 1.0

  def get_reward(self, physics):
    reward = 0.0
    distance = np.linalg.norm(
        np.asarray(physics.bind(self._target).pos)[:2] -
        np.asarray(physics.bind(self._walker.root_body).xpos)[:2])
    if distance < self._distance_tolerance:
      reward = 1.0
      if self._moving_target:
        self._reward_step_counter += 1
    return reward

  def before_step(self, physics, action, random_state):
    self._walker.apply_action(physics, action, random_state)

  def after_step(self, physics, random_state):
    self._failure_termination = False
    if (self._moving_target and
        self._reward_step_counter >= self._steps_before_moving_target):
      if self._target_relative:
        walker_pos = np.asarray(
            physics.bind(self._walker.root_body).xpos)[:2]
        lim = self._target_relative_dist
        target_x, target_y = random_state.uniform(
            -np.array([lim, lim]), np.array([lim, lim])) + walker_pos
      else:
        target_x, target_y = variation.evaluate(
            self._target_spawn_position, random_state=random_state)
      physics.bind(self._target).pos = [target_x, target_y, 0.]
      self._reward_step_counter = 0
