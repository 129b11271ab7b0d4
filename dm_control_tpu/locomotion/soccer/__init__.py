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


def _make_walker(name, walker_id, marker_rgba,
                 walker_type=WalkerType.BOXHEAD):
  if walker_type == WalkerType.BOXHEAD:
    return BoxHead(name=name, walker_id=walker_id,
                   marker_rgba=marker_rgba)
  if walker_type == WalkerType.ANT:
    return walkers.Ant(name=name)
  if walker_type == WalkerType.HUMANOID:
    from dm_control_tpu.locomotion.soccer import humanoid
    return humanoid.Humanoid(
        name=name, walker_id=walker_id, marker_rgba=marker_rgba,
        visual=humanoid.Humanoid.Visual.JERSEY)
  raise ValueError('Unrecognized walker type: %s' % walker_type)


def _make_players(team_size, walker_type):
  home, away = [], []
  for i in range(team_size):
    home.append(Player(Team.HOME, _make_walker(
        'home%d' % i, i, RGBA_BLUE, walker_type)))
    away.append(Player(Team.AWAY, _make_walker(
        'away%d' % i, i, RGBA_RED, walker_type)))
  return home + away


def _area_to_size(area, aspect_ratio=0.75):
  """(width, height) from area and aspect ratio."""
  return np.sqrt([area / aspect_ratio, area * aspect_ratio]) / 2.


def load(team_size, time_limit=45., random_state=None,
         disable_walker_contacts=False, enable_field_box=False,
         keep_aspect_ratio=False, terminate_on_goal=True,
         walker_type=WalkerType.BOXHEAD):
  """Constructs a `team_size`-vs-`team_size` soccer environment."""
  if not 1 <= team_size <= 11:
    raise ValueError(
        'team_size must be between 1 and 11 (got %d)' % team_size)

  goal_size = None
  min_size = (32, 24)
  max_size = (48, 36)
  if walker_type == WalkerType.HUMANOID:
    total_players = 2 * team_size
    goal_size = MINI_FOOTBALL_GOAL_SIZE
    min_size = _area_to_size(
        MINI_FOOTBALL_MIN_AREA_PER_HUMANOID * total_players)
    max_size = _area_to_size(
        MINI_FOOTBALL_MAX_AREA_PER_HUMANOID * total_players)

  task_factory = Task if terminate_on_goal else MultiturnTask
  task = task_factory(
      players=_make_players(team_size, walker_type),
      arena=RandomizedPitch(
          min_size=min_size, max_size=max_size,
          keep_aspect_ratio=keep_aspect_ratio, goal_size=goal_size,
          field_box=enable_field_box),
      disable_walker_contacts=disable_walker_contacts)
  return composer.Environment(task=task, time_limit=time_limit,
                              random_state=random_state)
