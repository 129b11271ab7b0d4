"""Go-to-target task.

Behavioral contract: reference locomotion/tasks/go_to_target.py — unit
reward within `distance_tolerance` of a target site; with
`moving_target` the target relocates after the walker has collected
reward for `steps_before_moving_target` steps (optionally relative to
the walker's position).
"""

from __future__ import annotations

import numpy as np

from dm_control_tpu import composer
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
    walker.create_root_joints(arena.attach(walker))

    anywhere = distributions.Uniform(
        low=-np.array(arena.size) / 2, high=np.array(arena.size) / 2)
    self._target_spawn = (anywhere if target_spawn_position is None
                          else target_spawn_position)
    self._walker_spawn = (anywhere if walker_spawn_position is None
                          else walker_spawn_position)
    self._walker_spawn_rotation = walker_spawn_rotation

    self._tolerance = distance_tolerance
    self._moving_target = moving_target
    self._target_relative = target_relative
    self._target_relative_dist = target_relative_dist
    self._move_after = steps_before_moving_target
    self._arrival_steps = 0

    self._target = arena.mjcf_model.worldbody.add(
        'site', name='target', type='sphere', pos=(0., 0., 0.),
        size=(0.1,), rgba=(0.9, 0.6, 0.6, 1.0))

    walker.observables.enable_proprioception()
    for obs in walker.observables.kinematic_sensors:
      obs.enabled = True

    self.set_timesteps(control_timestep, physics_timestep)

  root_entity = property(lambda self: self._arena)

  def target_position(self, physics):
    return np.array(physics.bind(self._target).pos)

  def _walker_xy(self, physics):
    return np.asarray(physics.bind(self._walker.root_body).xpos)[:2]

  def initialize_episode_mjcf(self, random_state):
    self._arena.regenerate(random_state=random_state)
    x, y = variation.evaluate(self._target_spawn,
                              random_state=random_state)
    self._target.pos = [x, y, 0.]

  def initialize_episode(self, physics, random_state):
    quat = None
    if self._walker_spawn_rotation is not None:
      half = variation.evaluate(self._walker_spawn_rotation,
                                random_state=random_state) / 2
      quat = [np.cos(half), 0, 0, np.sin(half)]
    x, y = variation.evaluate(self._walker_spawn,
                              random_state=random_state)
    self._walker.set_pose(physics, position=[x, y, 0.06],
                          quaternion=quat)
    self._arrival_steps = 0
    self._failure_termination = False

  def should_terminate_episode(self, physics):
    return self._failure_termination

  def get_discount(self, physics):
    return 0.0 if self._failure_termination else 1.0

  def get_reward(self, physics):
    gap = np.linalg.norm(
        np.asarray(physics.bind(self._target).pos)[:2]
        - self._walker_xy(physics))
    if gap >= self._tolerance:
      return 0.0
    if self._moving_target:
      self._arrival_steps += 1
    return 1.0

  def before_step(self, physics, action, random_state):
    self._walker.apply_action(physics, action, random_state)

  def _relocate_target(self, physics, random_state):
    if self._target_relative:
      lim = self._target_relative_dist
      xy = (self._walker_xy(physics)
            + random_state.uniform([-lim, -lim], [lim, lim]))
    else:
      xy = variation.evaluate(self._target_spawn,
                              random_state=random_state)
    physics.bind(self._target).pos = [xy[0], xy[1], 0.]
    self._arrival_steps = 0

  def after_step(self, physics, random_state):
    self._failure_termination = False
    if self._moving_target and self._arrival_steps >= self._move_after:
      self._relocate_target(physics, random_state)
