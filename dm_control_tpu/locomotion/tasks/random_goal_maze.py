"""Goal-seeking maze navigation
(reference locomotion/tasks/random_goal_maze.py:NullGoalMaze/ManyGoalsMaze).

The walker spawns at the maze's spawn cell; target spheres sit at the
maze's target cells; reaching a target yields `target_reward_scale` and
deactivates it. The maze regenerates per episode.
"""

from __future__ import annotations

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu.locomotion.props import target_sphere as ts_lib


class ManyGoalsMaze(composer.Task):
  """Collect as many maze goals as possible."""

  def __init__(self,
               walker,
               maze_arena,
               target_builder=None,
               target_reward_scale=1.0,
               randomize_spawn_rotation=True,
               contact_termination=False,
               physics_timestep=0.005,
               control_timestep=0.025):
    del contact_termination  # spawn search keeps walkers clear of walls
    self._arena = maze_arena
    self._walker = walker
    walker.create_root_joints(self._arena.attach(walker))
    self._target_reward_scale = target_reward_scale
    self._randomize_spawn_rotation = randomize_spawn_rotation
    if target_builder is None:
      target_builder = lambda name: ts_lib.TargetSphere(
          radius=0.4, height_above_ground=0.4, name=name)

    self._targets = []
    self._target_frames = []
    for i, _ in enumerate(maze_arena.target_positions):
      target = target_builder(name=f'goal_{i}')
      self._targets.append(target)
      self._target_frames.append(self._arena.attach(target))

    walker.observables.enable_proprioception()
    for obs in walker.observables.kinematic_sensors:
      obs.enabled = True

    self.set_timesteps(control_timestep, physics_timestep)

  @property
  def root_entity(self):
    return self._arena

  def initialize_episode_mjcf(self, random_state):
    self._arena.regenerate(random_state)
    positions = self._arena.target_positions
    for frame, pos in zip(self._target_frames, positions):
      frame.pos = [pos[0], pos[1], 0]

  def initialize_episode(self, physics, random_state):
    for target in self._targets:
      target.reset(physics)
    spawns = self._arena.spawn_positions
    if spawns:
      x, y = spawns[random_state.randint(len(spawns))]
    else:
      x, y = 0.0, 0.0
    if self._randomize_spawn_rotation:
      angle = random_state.uniform(-np.pi, np.pi)
      quat = [np.cos(angle / 2), 0, 0, np.sin(angle / 2)]
    else:
      quat = None
    self._walker.set_pose(physics, position=[x, y, 0.1],
                          quaternion=quat)

  def before_step(self, physics, action, random_state):
    self._walker.apply_action(physics, action, random_state)

  def get_reward(self, physics):
    walker_pos = np.asarray(
        physics.bind(self._walker.root_body).xpos)
    reward = 0.0
    for target in self._targets:
      was_active = target.activated
      target.maybe_activate(physics, walker_pos)
      if target.activated and not was_active:
        reward += self._target_reward_scale
    return reward

  def should_terminate_episode(self, physics):
    return all(t.activated for t in self._targets) if self._targets \
        else False

  def get_discount(self, physics):
    return 1.0
