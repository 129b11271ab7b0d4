"""Corridor locomotion tasks (reference locomotion/tasks/corridors.py:25).

RunThroughCorridor: a walker is rewarded for moving down a corridor at
a target velocity, terminated on non-foot ground contact is omitted in
round 1 (plain velocity reward).
"""

from __future__ import annotations

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu.utils import rewards


class RunThroughCorridor(composer.Task):
  """Reward running along the corridor's x-axis at a target speed."""

  def __init__(self,
               walker,
               arena,
               walker_spawn_position=(0, 0, 0),
               walker_spawn_rotation=None,
               target_velocity=3.0,
               contact_termination: bool = False,
               physics_timestep=0.005,
               control_timestep=0.025):
    self._arena = arena
    self._walker = walker
    spawn_frame = arena.add_free_entity(walker)
    self._spawn_frame = spawn_frame
    self._spawn_position = np.asarray(walker_spawn_position, np.float64)
    self._spawn_rotation = walker_spawn_rotation
    self._vel = target_velocity
    self._contact_termination = contact_termination
    self._failure_termination = False

    walker.observables.enable_proprioception()
    for obs in walker.observables.kinematic_sensors:
      obs.enabled = True

    self.set_timesteps(control_timestep, physics_timestep)

  @property
  def root_entity(self):
    return self._arena

  def initialize_episode_mjcf(self, random_state):
    self._arena.regenerate(random_state)

  def initialize_episode(self, physics, random_state):
    self._failure_termination = False
    if self._spawn_rotation is not None:
      angle = self._spawn_rotation
      quat = [np.cos(angle / 2), 0, 0, np.sin(angle / 2)]
    else:
      quat = None
    self._walker.set_pose(
        physics,
        position=self._spawn_position + np.array([0, 0, 0.06]),
        quaternion=quat)

  def get_reward(self, physics):
    # forward (egocentric x) speed from the walker's velocimeter
    vel = float(np.asarray(
        physics.named.data.sensordata[
            f'{self._walker.mjcf_model.model}/torso_vel'][0]))
    return float(rewards.tolerance(
        vel, bounds=(self._vel, float('inf')),
        margin=self._vel, value_at_margin=0, sigmoid='linear'))

  def should_terminate_episode(self, physics):
    return self._failure_termination

  def get_discount(self, physics):
    return 0.0 if self._failure_termination else 1.0
