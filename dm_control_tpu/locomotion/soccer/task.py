"""Multi-agent soccer task.

Behavioral contract: reference locomotion/soccer/task.py — two teams
of walkers, per-player +1/-1/0 rewards on goals, throw-in when the
ball leaves the court, MultiturnTask for continuous play. Restructured
around a vectorized team-sign reward and a shared goal-event hook.
"""

import numpy as np
from dm_env import specs

from dm_control_tpu import composer
from dm_control_tpu.locomotion.soccer import initializers
from dm_control_tpu.locomotion.soccer import observables as observables_lib
from dm_control_tpu.locomotion.soccer import soccer_ball

_THROW_IN_BALL_Z = 0.5


class Task(composer.Task):
  """Two teams of walkers play soccer; scoring ends the episode."""

  def __init__(self, players, arena, ball=None, initializer=None,
               observables=None, disable_walker_contacts=False,
               nconmax_per_player=200, njmax_per_player=400,
               control_timestep=0.025, tracking_cameras=()):
    del nconmax_per_player, njmax_per_player  # TPU engine: top-K budget
    self.arena = arena
    self.players = players

    self._initializer = initializer or initializers.UniformInitializer()
    self._observables = (observables
                         or observables_lib.CoreObservablesAdder())

    if disable_walker_contacts:
      for player in players:
        for geom in player.walker.mjcf_model.find_all('geom'):
          geom.set_attributes(contype=0)

    self.ball = ball or soccer_ball.SoccerBall()
    arena.add_free_entity(self.ball)
    arena.register_ball(self.ball)

    for player in players:
      player.walker.create_root_joints(arena.attach(player.walker))
      self.ball.register_player(player)
      self._observables(self, player)

    self._tracking_cameras = tracking_cameras
    self.set_timesteps(physics_timestep=0.005,
                       control_timestep=control_timestep)

  root_entity = property(lambda self: self.arena)

  @property
  def observables(self):
    return [player.walker.observables.as_dict(fully_qualified=False)
            for player in self.players]

  def action_spec(self, physics):
    """Multi-agent action spec: one bounded spec per player."""
    return [player.walker.action_spec(physics)
            for player in self.players]

  # ------------------------------------------------ episode lifecycle

  def initialize_episode_mjcf(self, random_state):
    self.arena.initialize_episode_mjcf(random_state)

  def initialize_episode(self, physics, random_state):
    self.arena.initialize_episode(physics, random_state)
    for player in self.players:
      player.walker.reinitialize_pose(physics, random_state)
    self._initializer(self, physics, random_state)

  def _throw_in(self, physics, random_state):
    """Drops the ball back in play, pulled toward midfield."""
    x, y, _ = np.asarray(physics.bind(self.ball.geom).xpos)
    shrink = random_state.uniform([0.7, 0.7], [0.9, 0.9])
    self.ball.set_pose(
        physics, [x * shrink[0], y * shrink[1], _THROW_IN_BALL_Z])
    self.ball.set_velocity(physics, velocity=np.zeros(3),
                           angular_velocity=np.zeros(3))
    self.ball.initialize_entity_trackers()

  def before_step(self, physics, actions, random_state):
    for player, action in zip(self.players, actions):
      player.walker.apply_action(physics, action, random_state)
    if self.arena.detected_off_court():
      self._throw_in(physics, random_state)

  # ------------------------------------------------ reward/termination

  def get_reward(self, physics):
    """Per-player: +1 if their team scored, -1 if it conceded, 0."""
    scoring_team = self.arena.detected_goal()
    signs = [0. if not scoring_team
             else (1. if p.team == scoring_team else -1.)
             for p in self.players]
    return [np.float32(s) for s in signs]

  def get_reward_spec(self):
    return [specs.Array(name='reward', shape=(), dtype=np.float32)
            for _ in self.players]

  def get_discount(self, physics):
    return np.float32(0. if self.arena.detected_goal() else 1.)

  def get_discount_spec(self):
    return specs.Array(name='discount', shape=(), dtype=np.float32)

  def should_terminate_episode(self, physics):
    return self.arena.detected_goal() is not None


class MultiturnTask(Task):
  """Continuous play: goals re-kick-off instead of terminating."""

  def __init__(self, *args, **kwargs):
    super().__init__(*args, **kwargs)
    self._kickoff_pending = False

  def should_terminate_episode(self, physics):
    return False

  def get_discount(self, physics):
    return np.ones((), np.float32)

  def before_step(self, physics, actions, random_state):
    super().before_step(physics, actions, random_state)
    if self._kickoff_pending:
      self.ball.initialize_entity_trackers()
      self._kickoff_pending = False

  def after_step(self, physics, random_state):
    super().after_step(physics, random_state)
    if self.arena.detected_goal():
      self._initializer(self, physics, random_state)
      self._kickoff_pending = True
