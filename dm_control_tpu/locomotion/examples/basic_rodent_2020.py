"""Prebuilt rodent environments.

Behavioral contract: reference locomotion/examples/basic_rodent_2020.py
— the same factory names, walker, arenas, and task parameters (the
keyword values below are the task spec).

Each factory is a task recipe wrapped by `_recipe`, which supplies the
shared environment envelope (time limit, obs-buffer squeeze).
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

# every rodent example runs 1 kHz physics under a 50 Hz controller
_CLOCK = dict(physics_timestep=0.001, control_timestep=0.02)


def _recipe(build_task):
  """Lifts a task-building function into an environment factory."""

  @functools.wraps(build_task)
  def factory(random_state=None):
    return composer.Environment(
        task=build_task(), time_limit=_TIME_LIMIT,
        random_state=random_state,
        strip_singleton_obs_buffer_dim=True)

  return factory


def _sighted_rat():
  return rodent.Rat(
      observable_options={'egocentric_camera': dict(enabled=True)})


@_recipe
def rodent_escape_bowl():
  """Escape from a bowl-shaped terrain."""
  return escape.Escape(
      arena=bowl.Bowl(size=(20., 20.), aesthetic='outdoor_natural'),
      walker=_sighted_rat(), **_CLOCK)


@_recipe
def rodent_run_gaps():
  """Run down a corridor with gaps between platforms."""
  return corr_tasks.RunThroughCorridor(
      arena=corr_arenas.GapsCorridor(
          corridor_width=2, corridor_length=40,
          platform_length=distributions.Uniform(.4, .8),
          gap_length=distributions.Uniform(.05, .2)),
      target_velocity=1.0, contact_termination=False,
      walker_spawn_position=(5, 0, 0), walker_spawn_rotation=0,
      walker=_sighted_rat(), **_CLOCK)


@_recipe
def rodent_maze_forage():
  """Collect all targets scattered through a random maze."""
  return random_goal_maze.ManyGoalsMaze(
      maze_arena=mazes.RandomMazeWithTargets(
          xy_scale=.5, z_height=.3, x_cells=11, y_cells=11,
          room_min_size=4, room_max_size=5, max_rooms=4,
          spawns_per_room=1, targets_per_room=3),
      target_builder=functools.partial(
          target_sphere.TargetSphere, radius=0.05,
          height_above_ground=.125, rgb1=(0, 0, 0.4),
          rgb2=(0, 0, 0.7)),
      target_reward_scale=50., contact_termination=False,
      walker=_sighted_rat(), **_CLOCK)


@_recipe
def rodent_two_touch():
  """Touch an orb, wait an interval, touch it again."""
  return reach.TwoTouch(
      arena=floors.Floor(size=(10., 10.)),
      target_builders=[functools.partial(
          target_sphere.TargetSphereTwoTouch, radius=0.025)],
      target_type_rewards=[25.], shuffle_target_builders=False,
      target_area=(1.5, 1.5), randomize_spawn_rotation=True,
      walker=_sighted_rat(), **_CLOCK)
