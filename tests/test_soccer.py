"""Soccer: pitch geometry, ball trackers, multi-agent task stepping."""

import numpy as np
import pytest

from dm_control_tpu.locomotion import soccer


@pytest.fixture(scope='module')
def env_1v1():
  env = soccer.load(team_size=1, time_limit=5., random_state=3,
                    walker_type=soccer.WalkerType.BOXHEAD)
  return env


def test_load_and_reset(env_1v1):
  ts = env_1v1.reset()
  obs = ts.observation
  assert isinstance(obs, list) and len(obs) == 2
  for player_obs in obs:
    for key in ('ball_ego_position', 'stats_vel_to_ball',
                'opponent_0_ego_position', 'team_goal_mid'):
      assert key in player_obs, sorted(player_obs)


def test_multi_agent_step(env_1v1):
  env_1v1.reset()
  specs = env_1v1.action_spec()
  assert isinstance(specs, list) and len(specs) == 2
  actions = [np.zeros(s.shape) for s in specs]
  for _ in range(3):
    ts = env_1v1.step(actions)
    assert isinstance(ts.reward, list) and len(ts.reward) == 2
    assert all(np.isfinite(r) for r in ts.reward)


def test_goal_detection():
  pitch = soccer.Pitch(size=(12, 9))
  assert pitch.detected_goal() is None
  ball = soccer.SoccerBall(radius=0.2, mass=0.4)
  pitch.add_free_entity(ball)
  pitch.register_ball(ball)
  from dm_control_tpu import mjcf
  physics = mjcf.Physics.from_mjcf_model(pitch.mjcf_model)
  # place the ball inside the home goal detection volume
  goal_center = (np.asarray(pitch.home_goal.upper)
                 + np.asarray(pitch.home_goal.lower)) / 2
  ball.set_pose(physics, goal_center)
  physics.forward()
  pitch.home_goal.after_substep(physics, None)
  pitch.away_goal.after_substep(physics, None)
  assert pitch.detected_goal() == soccer.Team.AWAY


def test_throw_in_off_court():
  env = soccer.load(team_size=1, time_limit=5., random_state=1)
  env.reset()
  task = env.task
  ball = task.ball
  # push the ball far off the field: the next before_step throws in
  ball.set_pose(env.physics, [100., 100., 0.5])
  env.physics.forward()
  task.arena.field.after_substep(env.physics, None)
  assert task.arena.detected_off_court()
  specs = env.action_spec()
  env.step([np.zeros(s.shape) for s in specs])
  pos, _ = ball.get_pose(env.physics)
  # throw-in shrinks the ball position toward the pitch center
  assert np.linalg.norm(np.asarray(pos)[:2]) < np.linalg.norm([100., 100.])
