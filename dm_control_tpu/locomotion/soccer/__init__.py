"""Multi-agent MuJoCo soccer environment
(behavioural counterpart of reference
dm_control/locomotion/soccer/__init__.py:30-155).
"""

import enum

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu.locomotion import walkers
from dm_control_tpu.locomotion.soccer.boxhead import BoxHead
from dm_control_tpu.locomotion.soccer.camera import (
    MultiplayerTrackingCamera)
from dm_control_tpu.locomotion.soccer.initializers import Initializer
from dm_control_tpu.locomotion.soccer.initializers import (
    UniformInitializer)
from dm_control_tpu.locomotion.soccer.observables import (
    CoreObservablesAdder, MultiObservablesAdder, ObservablesAdder)
from dm_control_tpu.locomotion.soccer.pitch import (
    MINI_FOOTBALL_GOAL_SIZE, MINI_FOOTBALL_MAX_AREA_PER_HUMANOID,
    MINI_FOOTBALL_MIN_AREA_PER_HUMANOID, Pitch, RandomizedPitch)
from dm_control_tpu.locomotion.soccer.soccer_ball import (
    SoccerBall, regulation_soccer_ball)
from dm_control_tpu.locomotion.soccer.task import MultiturnTask, Task
from dm_control_tpu.locomotion.soccer.team import (
    Player, RGBA_BLUE, RGBA_RED, Team)


class WalkerType(enum.Enum):
  BOXHEAD = 0
  ANT = 1
  HUMANOID = 2


def _boxhead_builder(name, walker_id, marker_rgba):
  return BoxHead(name=name, walker_id=walker_id,
                 marker_rgba=marker_rgba)


def _ant_builder(name, walker_id, marker_rgba):
  del walker_id, marker_rgba  # the ant has no jersey marker
  return walkers.Ant(name=name)


def _humanoid_builder(name, walker_id, marker_rgba):
  from dm_control_tpu.locomotion.soccer import humanoid
  return humanoid.Humanoid(
      name=name, walker_id=walker_id, marker_rgba=marker_rgba,
      visual=humanoid.Humanoid.Visual.JERSEY)


_WALKER_BUILDERS = {
    WalkerType.BOXHEAD: _boxhead_builder,
    WalkerType.ANT: _ant_builder,
    WalkerType.HUMANOID: _humanoid_builder,
}


def _roster(team_size, walker_type):
  """Both teams' players: blue home side then red away side."""
  try:
    build = _WALKER_BUILDERS[walker_type]
  except KeyError:
    raise ValueError(f'Unrecognized walker type: {walker_type}')
  sides = ((Team.HOME, 'home', RGBA_BLUE), (Team.AWAY, 'away', RGBA_RED))
  return [Player(team, build(f'{prefix}{i}', i, rgba))
          for team, prefix, rgba in sides for i in range(team_size)]


def _pitch_bounds(team_size, walker_type):
  """(min_size, max_size, goal_size) for the randomized pitch.

  Boxhead/ant matches use the fixed reference envelope; humanoid
  matches scale the field area per player (mini-football spec)."""
  if walker_type != WalkerType.HUMANOID:
    return (32, 24), (48, 36), None
  n = 2 * team_size

  def half_dims(area, aspect=0.75):
    return np.sqrt([area / aspect, area * aspect]) / 2.

  return (half_dims(MINI_FOOTBALL_MIN_AREA_PER_HUMANOID * n),
          half_dims(MINI_FOOTBALL_MAX_AREA_PER_HUMANOID * n),
          MINI_FOOTBALL_GOAL_SIZE)


def load(team_size, time_limit=45., random_state=None,
         disable_walker_contacts=False, enable_field_box=False,
         keep_aspect_ratio=False, terminate_on_goal=True,
         walker_type=WalkerType.BOXHEAD):
  """Constructs a `team_size`-vs-`team_size` soccer environment."""
  if not 1 <= team_size <= 11:
    raise ValueError(
        f'team_size must be between 1 and 11 (got {team_size})')

  min_size, max_size, goal_size = _pitch_bounds(team_size, walker_type)
  task_factory = Task if terminate_on_goal else MultiturnTask
  task = task_factory(
      players=_roster(team_size, walker_type),
      arena=RandomizedPitch(
          min_size=min_size, max_size=max_size,
          keep_aspect_ratio=keep_aspect_ratio, goal_size=goal_size,
          field_box=enable_field_box),
      disable_walker_contacts=disable_walker_contacts)
  return composer.Environment(task=task, time_limit=time_limit,
                              random_state=random_state)
