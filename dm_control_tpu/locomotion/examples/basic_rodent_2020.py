"""Prebuilt rodent environments.

Behavioral contract: reference locomotion/examples/basic_rodent_2020.py
— the same factory names, walker, arenas, and task parameters.
"""

import functools

from dm_control_tpu import composer
from dm_control_tpu.composer.variation import distributions
from dm_control_tpu.locomotion.arenas import bowl
from dm_control_tpu.locomotion.arenas import corridors as corr_arenas
from dm_control_tpu.locomotion.arenas import floors
from dm_control_tpu.locomotion.arenas import mazes
from dm_control_tpu.locomotion.props import target_sphere
from dm_control_tpu.locomotion.tasks import corridors as corr_tasks
from dm_control_tpu.locomotion.tasks import escape
from dm_control_tpu.locomotion.tasks import random_goal_maze
from dm_control_tpu.locomotion.tasks import reach
from dm_control_tpu.locomotion.walkers import rodent

_TIME_LIMIT = 30
_PHYSICS_TIMESTEP = 0.001
_CONTROL_TIMESTEP = 0.02


def _env(task, random_state):
  return composer.Environment(time_limit=_TIME_LIMIT, task=task,
                              random_state=random_state,
                              strip_singleton_obs_buffer_dim=True)


def _rat_with_vision():
  return rodent.Rat(
      observable_options={'egocentric_camera': dict(enabled=True)})


def rodent_escape_bowl(random_state=None):
  """Escape from a bowl-shaped terrain."""
  task = escape.Escape(
      walker=_rat_with_vision(),
      arena=bowl.Bowl(size=(20., 20.), aesthetic='outdoor_natural'),
      physics_timestep=_PHYSICS_TIMESTEP,
      control_timestep=_CONTROL_TIMESTEP)
  return _env(task, random_state)


def rodent_run_gaps(random_state=None):
  """Run down a corridor with gaps between platforms."""
  arena = corr_arenas.GapsCorridor(
      platform_length=distributions.Uniform(.4, .8),
      gap_length=distributions.Uniform(.05, .2),
      corridor_width=2, corridor_length=40)
  task = corr_tasks.RunThroughCorridor(
      walker=_rat_with_vision(), arena=arena,
      walker_spawn_position=(5, 0, 0), walker_spawn_rotation=0,
      target_velocity=1.0, contact_termination=False,
      physics_timestep=_PHYSICS_TIMESTEP,
      control_timestep=_CONTROL_TIMESTEP)
  return _env(task, random_state)


def rodent_maze_forage(random_state=None):
  """Collect all targets scattered through a random maze."""
  task = random_goal_maze.ManyGoalsMaze(
      walker=_rat_with_vision(),
      maze_arena=mazes.RandomMazeWithTargets(
          x_cells=11, y_cells=11, xy_scale=.5, z_height=.3,
          max_rooms=4, room_min_size=4, room_max_size=5,
          spawns_per_room=1, targets_per_room=3),
      target_builder=functools.partial(
          target_sphere.TargetSphere, radius=0.05,
          height_above_ground=.125, rgb1=(0, 0, 0.4),
          rgb2=(0, 0, 0.7)),
      target_reward_scale=50., contact_termination=False,
      physics_timestep=_PHYSICS_TIMESTEP,
      control_timestep=_CONTROL_TIMESTEP)
  return _env(task, random_state)


def rodent_two_touch(random_state=None):
  """Touch an orb, wait an interval, touch it again."""
  task = reach.TwoTouch(
      walker=_rat_with_vision(),
      arena=floors.Floor(size=(10., 10.)),
      target_builders=[functools.partial(
          target_sphere.TargetSphereTwoTouch, radius=0.025)],
      randomize_spawn_rotation=True, target_type_rewards=[25.],
      shuffle_target_builders=False, target_area=(1.5, 1.5),
      physics_timestep=_PHYSICS_TIMESTEP,
      control_timestep=_CONTROL_TIMESTEP)
  return _env(task, random_state)
