"""Prebuilt CMU-humanoid environments.

Behavioral contract: reference locomotion/examples/basic_cmu_2019.py —
the same factory names, walkers, arenas, and task parameters
(texture/skybox styling is dropped: the ray-caster shades from rgba).
"""

import functools

from dm_control_tpu import composer
from dm_control_tpu.composer.variation import distributions
from dm_control_tpu.locomotion.arenas import corridors as corr_arenas
from dm_control_tpu.locomotion.arenas import floors
from dm_control_tpu.locomotion.arenas import mazes
from dm_control_tpu.locomotion.props import target_sphere
from dm_control_tpu.locomotion.tasks import corridors as corr_tasks
from dm_control_tpu.locomotion.tasks import go_to_target
from dm_control_tpu.locomotion.tasks import random_goal_maze
from dm_control_tpu.locomotion.walkers import cmu_humanoid

_TIME_LIMIT = 30


def _env(task, random_state):
  return composer.Environment(time_limit=_TIME_LIMIT, task=task,
                              random_state=random_state,
                              strip_singleton_obs_buffer_dim=True)


def _walker_with_vision():
  return cmu_humanoid.CMUHumanoidPositionControlled(
      observable_options={'egocentric_camera': dict(enabled=True)})


def cmu_humanoid_run_walls(random_state=None):
  """Run down a corridor obstructed by walls."""
  task = corr_tasks.RunThroughCorridor(
      walker=_walker_with_vision(),
      arena=corr_arenas.WallsCorridor(
          wall_gap=4., wall_width=distributions.Uniform(1, 7),
          wall_height=3.0, corridor_width=10, corridor_length=100,
          include_initial_padding=False),
      walker_spawn_position=(0.5, 0, 0), target_velocity=3.0,
      physics_timestep=0.005, control_timestep=0.03)
  return _env(task, random_state)


def cmu_humanoid_run_gaps(random_state=None):
  """Run down a corridor with gaps between platforms."""
  task = corr_tasks.RunThroughCorridor(
      walker=_walker_with_vision(),
      arena=corr_arenas.GapsCorridor(
          platform_length=distributions.Uniform(.3, 2.5),
          gap_length=distributions.Uniform(.5, 1.25),
          corridor_width=10, corridor_length=100),
      walker_spawn_position=(0.5, 0, 0), target_velocity=3.0,
      physics_timestep=0.005, control_timestep=0.03)
  return _env(task, random_state)


def cmu_humanoid_go_to_target(random_state=None):
  """Walk to a target location on an open floor."""
  task = go_to_target.GoToTarget(
      walker=cmu_humanoid.CMUHumanoidPositionControlled(),
      arena=floors.Floor(), physics_timestep=0.005,
      control_timestep=0.03)
  return _env(task, random_state)


def cmu_humanoid_maze_forage(random_state=None):
  """Collect all targets scattered through a random maze."""
  task = random_goal_maze.ManyGoalsMaze(
      walker=_walker_with_vision(),
      maze_arena=mazes.RandomMazeWithTargets(
          x_cells=11, y_cells=11, xy_scale=3, max_rooms=4,
          room_min_size=4, room_max_size=5, spawns_per_room=1,
          targets_per_room=3),
      target_builder=functools.partial(
          target_sphere.TargetSphere, radius=0.4,
          rgb1=(0, 0, 0.4), rgb2=(0, 0, 0.7)),
      target_reward_scale=50., physics_timestep=0.005,
      control_timestep=0.03)
  return _env(task, random_state)
