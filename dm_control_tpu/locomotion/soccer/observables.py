"""Per-player observables for soccer
(behavioural counterpart of reference
dm_control/locomotion/soccer/observables.py:44-330).

The reference realizes egocentric observations through extra MJCF
frame sensors with reference frames; here they are Generic observables
computed from body poses via each walker's egocentric transform — the
same quantities without growing the compiled sensor table per player
pair.
"""

import abc

import numpy as np

from dm_control_tpu.composer.observation import observable as base_observable
from dm_control_tpu.locomotion.soccer import team as team_lib


class ObservablesAdder(metaclass=abc.ABCMeta):
  """A callable adding a set of per-player observables to a task."""

  @abc.abstractmethod
  def __call__(self, task, player):
    raise NotImplementedError


class MultiObservablesAdder(ObservablesAdder):

  def __init__(self, observables):
    self._observables = observables

  def __call__(self, task, player):
    for adder in self._observables:
      adder(task, player)


class CoreObservablesAdder(ObservablesAdder):
  """Core set of per-player observables."""

  def __call__(self, task, player):
    self._add_player_proprio_observables(player)
    self._add_player_observables_on_ball(player, task.ball)

    teammate_id = 0
    opponent_id = 0
    for other in task.players:
      if other is player:
        continue
      if player.team != other.team:
        prefix = 'opponent_{}'.format(opponent_id)
        opponent_id += 1
      else:
        prefix = 'teammate_{}'.format(teammate_id)
        teammate_id += 1
      self._add_player_observables_on_other(player, other, prefix)

    self._add_player_arena_observables(player, task.arena)
    self._add_player_stats_observables(task, player)

  def _ego(self, player, physics, world_point):
    """A world point in the player's root frame."""
    root = physics.bind(player.walker.root_body)
    rel = np.asarray(world_point) - np.asarray(root.xpos)
    xmat = np.asarray(root.xmat).reshape(3, 3)
    return rel @ xmat

  def _add_player_observables_on_other(self, player, other, prefix):
    if player is other:
      raise ValueError('cannot observe player on itself')
    walker = player.walker

    def _ego_position(physics):
      pos = np.asarray(physics.bind(other.walker.root_body).xpos)
      return self._ego(player, physics, pos)

    def _ego_linvel(physics):
      my_root = physics.bind(walker.root_body)
      xmat = np.asarray(my_root.xmat).reshape(3, 3)
      vel, _ = other.walker.get_velocity(physics)
      return np.asarray(vel) @ xmat

    def _ego_orientation(physics):
      my_xmat = np.asarray(
          physics.bind(walker.root_body).xmat).reshape(3, 3)
      other_xmat = np.asarray(
          physics.bind(other.walker.root_body).xmat).reshape(3, 3)
      return (my_xmat.T @ other_xmat).ravel()

    def _ego_end_effectors(physics):
      pts = [np.asarray(physics.bind(e).xpos)
             for e in other.walker.end_effectors]
      return np.concatenate(
          [self._ego(player, physics, p) for p in pts])

    walker.observables.add_observable(
        f'{prefix}_ego_position',
        base_observable.Generic(_ego_position), enabled=True)
    walker.observables.add_observable(
        f'{prefix}_ego_linear_velocity',
        base_observable.Generic(_ego_linvel), enabled=True)
    walker.observables.add_observable(
        f'{prefix}_ego_orientation',
        base_observable.Generic(_ego_orientation), enabled=True)
    walker.observables.add_observable(
        f'{prefix}_ego_end_effectors_pos',
        base_observable.Generic(_ego_end_effectors), enabled=True)
    walker.observables.add_observable(
        f'{prefix}_end_effectors_pos',
        other.walker.observables.end_effectors_pos, enabled=True)

  def _add_player_observables_on_ball(self, player, ball):
    walker = player.walker

    def _ball_ego_pos(physics):
      return self._ego(player, physics,
                       np.asarray(physics.bind(ball.geom).xpos))

    def _ball_ego_linvel(physics):
      xmat = np.asarray(
          physics.bind(walker.root_body).xmat).reshape(3, 3)
      vel, _ = ball.get_velocity(physics)
      return np.asarray(vel) @ xmat

    def _ball_ego_angvel(physics):
      xmat = np.asarray(
          physics.bind(walker.root_body).xmat).reshape(3, 3)
      _, angvel = ball.get_velocity(physics)
      return np.asarray(angvel) @ xmat

    walker.observables.add_observable(
        'ball_ego_position',
        base_observable.Generic(_ball_ego_pos), enabled=True)
    walker.observables.add_observable(
        'ball_ego_linear_velocity',
        base_observable.Generic(_ball_ego_linvel), enabled=True)
    walker.observables.add_observable(
        'ball_ego_angular_velocity',
        base_observable.Generic(_ball_ego_angvel), enabled=True)

  def _add_player_proprio_observables(self, player):
    for obs in (player.walker.observables.proprioception +
                player.walker.observables.kinematic_sensors):
      obs.enabled = True
    if 'prev_action' in list(player.walker.observables):
      player.walker.observables['prev_action'].enabled = True

  def _add_player_arena_observables(self, player, arena):
    """Egocentric positions of the goals and field corners."""
    walker = player.walker
    # names follow 'facing the opponent goal' convention
    clockwise_names = [
        'team_goal_back_right', 'team_goal_mid', 'team_goal_front_left',
        'field_front_left', 'opponent_goal_back_left',
        'opponent_goal_mid', 'opponent_goal_front_right',
        'field_back_right',
    ]

    def goal_mid(goal):
      return (np.asarray(goal.upper) + np.asarray(goal.lower)) / 2.

    clockwise_features = [
        lambda _: np.asarray(arena.home_goal.lower[:2]),
        lambda _: goal_mid(arena.home_goal),
        lambda _: np.asarray(arena.home_goal.upper[:2]),
        lambda _: np.asarray(arena.field.upper),
        lambda _: np.asarray(arena.away_goal.upper[:2]),
        lambda _: goal_mid(arena.away_goal),
        lambda _: np.asarray(arena.away_goal.lower[:2]),
        lambda _: np.asarray(arena.field.lower),
    ]
    if player.team != team_lib.Team.HOME:
      half = len(clockwise_features) // 2
      clockwise_features = (clockwise_features[half:]
                            + clockwise_features[:half])

    for name, feature in zip(clockwise_names, clockwise_features):
      def _ego_feature(physics, feature=feature):
        target = np.asarray(feature(physics), dtype=float)
        root = physics.bind(walker.root_body)
        origin = np.asarray(root.xpos)[:len(target)]
        rel = target - origin
        xmat = np.asarray(root.xmat).reshape(3, 3)
        ndim = len(target)
        return rel @ xmat[:ndim, :ndim]

      walker.observables.add_observable(
          name, base_observable.Generic(_ego_feature), enabled=True)

  def _add_player_stats_observables(self, task, player):
    walker = player.walker

    def _stats_vel_to_ball(physics):
      dir_ = (np.asarray(physics.bind(task.ball.geom).xpos)
              - np.asarray(physics.bind(walker.root_body).xpos))
      vel, _ = walker.get_velocity(physics)
      return np.sum(np.dot(
          dir_[:2] / (np.linalg.norm(dir_[:2]) + 1e-7),
          np.asarray(vel)[:2]))

    walker.observables.add_observable(
        'stats_vel_to_ball',
        base_observable.Generic(_stats_vel_to_ball), enabled=True)

    def _stats_closest_vel_to_ball(physics):
      closest, best = None, np.inf
      for p in task.players:
        if p.team == player.team:
          d = np.linalg.norm(
              np.asarray(physics.bind(task.ball.geom).xpos)
              - np.asarray(physics.bind(p.walker.root_body).xpos))
          if d < best:
            best, closest = d, p
      return _stats_vel_to_ball(physics) if closest is player else 0.

    walker.observables.add_observable(
        'stats_closest_vel_to_ball',
        base_observable.Generic(_stats_closest_vel_to_ball),
        enabled=True)

    def _stats_vel_ball_to_goal(physics):
      goal = (task.arena.away_goal if player.team == team_lib.Team.HOME
              else task.arena.home_goal)
      center = (np.asarray(goal.upper) + np.asarray(goal.lower)) / 2.
      direction = center - np.asarray(physics.bind(task.ball.geom).xpos)
      vel, _ = task.ball.get_velocity(physics)
      norm = np.linalg.norm(direction)
      if norm:
        direction = direction / norm
      return np.sum(np.dot(direction, np.asarray(vel)))

    walker.observables.add_observable(
        'stats_vel_ball_to_goal',
        base_observable.Generic(_stats_vel_ball_to_goal), enabled=True)
