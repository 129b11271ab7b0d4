"""Episode initializers for soccer
(behavioural counterpart of reference
dm_control/locomotion/soccer/initializers.py:25-126).
"""

import abc

import numpy as np

_INIT_BALL_Z = 0.5
_SPAWN_RATIO = 0.6


class Initializer(metaclass=abc.ABCMeta):

  @abc.abstractmethod
  def __call__(self, task, physics, random_state):
    """Initialize an episode for a task."""


class UniformInitializer(Initializer):
  """Uniformly spawns the walkers and ball over the pitch.

  Overlap avoidance: resample until every pair of spawned entities is
  separated by `min_separation` in the plane (the reference's
  contact-scan rejection with the same retry bound).
  """

  def __init__(self, spawn_ratio=_SPAWN_RATIO, init_ball_z=_INIT_BALL_Z,
               max_collision_avoidance_retries=100, min_separation=1.0):
    self._spawn_ratio = spawn_ratio
    self._init_ball_z = init_ball_z
    self._max_retries = max_collision_avoidance_retries
    self._min_separation = min_separation

  def _initialize_ball(self, ball, spawn_range, physics, random_state):
    x, y = random_state.uniform(-spawn_range, spawn_range)
    ball.set_pose(physics, [x, y, self._init_ball_z])
    ball.set_velocity(physics, velocity=np.zeros(3),
                      angular_velocity=np.zeros(3))
    return np.array([x, y])

  def _initialize_walker(self, walker, spawn_range, physics,
                         random_state):
    walker.reinitialize_pose(physics, random_state)
    x, y = random_state.uniform(-spawn_range, spawn_range)
    (_, _, z), quat = walker.get_pose(physics)
    walker.set_pose(physics, [x, y, z], quat)
    rotation = random_state.uniform(-np.pi, np.pi)
    quat = [np.cos(rotation / 2), 0, 0, np.sin(rotation / 2)]
    walker.shift_pose(physics, quaternion=quat)
    walker.set_velocity(physics, velocity=np.zeros(3),
                        angular_velocity=np.zeros(3))
    return np.array([x, y])

  def __call__(self, task, physics, random_state):
    spawn_range = np.asarray(task.arena.size) * self._spawn_ratio
    for attempt in range(self._max_retries + 1):
      positions = [self._initialize_ball(task.ball, spawn_range,
                                         physics, random_state)]
      for player in task.players:
        positions.append(self._initialize_walker(
            player.walker, spawn_range, physics, random_state))
      pts = np.stack(positions)
      dists = np.linalg.norm(pts[None] - pts[:, None], axis=-1)
      dists += np.eye(len(pts)) * 1e9
      if float(dists.min()) >= self._min_separation:
        physics.forward()
        return
    raise RuntimeError(
        'UniformInitializer: `max_retries` (%d) exceeded.'
        % self._max_retries)
