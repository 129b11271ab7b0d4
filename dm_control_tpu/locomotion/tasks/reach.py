"""Two-touch target reaching task.

Behavioral contract: reference locomotion/tasks/reach.py — touch a
target, then touch it again inside a prescribed time window; shaped
closeness reward, timeout/cooldown handling, task_logic observable.
Restructured: the touch protocol is an explicit per-state handler
dispatch instead of one branched reward method, and targets are
tracked as a flat list with type tags.
"""

import collections
import enum

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu.composer.observation import observable as dm_observable

DEFAULT_ALIVE_THRESHOLD = -1.0
DEFAULT_PHYSICS_TIMESTEP = 0.005
DEFAULT_CONTROL_TIMESTEP = 0.03

# walker class name fragment -> (left hand body, right hand body)
_HAND_BODY_NAMES = (
    ('CMUHumanoid', ('lhand', 'rhand')),
    ('Rat', ('hand_L', 'hand_R')),
    ('Rodent', ('hand_L', 'hand_R')),
)


class TwoTouchState(enum.IntEnum):
  PRE_TOUCH = 0
  TOUCHED_ONCE = 1
  TOUCHED_TWICE = 2  # at appropriate time
  TOUCHED_TOO_SOON = 3
  NO_SECOND_TOUCH = 4


def _find_hands(walker):
  """The walker's two hand bodies (by name, else end effectors)."""
  cls = str(type(walker))
  for fragment, (left, right) in _HAND_BODY_NAMES:
    if fragment in cls:
      return (walker.mjcf_model.find('body', left),
              walker.mjcf_model.find('body', right))
  effectors = list(walker.end_effectors)
  if len(effectors) < 2:
    raise ValueError('Walker must expose two hands/end effectors.')
  return effectors[0], effectors[1]


class TwoTouch(composer.Task):
  """Touch a target twice, with a prescribed delay between touches."""

  def __init__(self,
               walker,
               arena,
               target_builders,
               target_type_rewards,
               shuffle_target_builders=False,
               randomize_spawn_position=False,
               randomize_spawn_rotation=True,
               rotation_bias_factor=0,
               aliveness_reward=0.0,
               touch_interval=0.8,
               interval_tolerance=0.1,
               failure_timeout=1.2,
               reset_delay=0.,
               z_height=.14,
               target_area=(),
               physics_timestep=DEFAULT_PHYSICS_TIMESTEP,
               control_timestep=DEFAULT_CONTROL_TIMESTEP):
    self._walker = walker
    self._arena = arena
    walker.create_root_joints(arena.attach(walker))
    self._lhand_body, self._rhand_body = _find_hands(walker)
    self._lhand_geoms = self._lhand_body.find_all('geom')
    self._rhand_geoms = self._rhand_body.find_all('geom')

    self._target_builders = list(target_builders)
    self._target_type_rewards = tuple(target_type_rewards)
    self._shuffle_target_builders = shuffle_target_builders
    self._targets = []          # list of (type, entity)
    self._rewarded = {}         # (stage, type, index) -> bool

    self._randomize_spawn_position = randomize_spawn_position
    self._spawn_position = [0.0, 0.0]
    self._randomize_spawn_rotation = randomize_spawn_rotation
    self._rotation_bias_factor = rotation_bias_factor

    self._aliveness_reward = aliveness_reward
    self._discount = 1.0

    self._touch_interval = touch_interval
    self._interval_tolerance = interval_tolerance
    self._failure_timeout = failure_timeout
    self._reset_delay = reset_delay
    self._state = TwoTouchState.PRE_TOUCH

    self._z_height = z_height
    if target_area:
      self._target_area = target_area
    else:
      half = getattr(arena, 'size', (4., 4.))
      self._target_area = [half[0] / 2, half[1] / 2]
    self._target_positions = [(1., 1., z_height)]

    self.set_timesteps(physics_timestep=physics_timestep,
                       control_timestep=control_timestep)

    self._task_observables = collections.OrderedDict(
        task_logic=dm_observable.Generic(
            lambda physics: np.array([self._state])))

    if walker.egocentric_camera is not None:
      walker.observables.egocentric_camera.height = 64
      walker.observables.egocentric_camera.width = 64
      walker.observables.egocentric_camera.enabled = True
    for obs in (walker.observables.proprioception +
                walker.observables.kinematic_sensors +
                walker.observables.dynamic_sensors +
                list(self._task_observables.values())):
      obs.enabled = True

  name = property(lambda self: 'two_touch')
  task_observables = property(lambda self: self._task_observables)
  root_entity = property(lambda self: self._arena)

  # -------------------------------------------------- episode setup

  def _build_targets(self, random_state):
    """Fresh (type, entity) pairs: one primary target of type 0, any
    further target positions filled by the type-1 builder."""
    if self._shuffle_target_builders:
      random_state.shuffle(self._target_builders)
    counts = (1, len(self._target_positions) - 1)
    built = []
    for target_type, count in enumerate(counts):
      if count < 1:
        break
      builder = self._target_builders[target_type]
      built.extend(
          (target_type, builder(name=f'target_{target_type}_{i}'))
          for i in range(count))
    return built

  def initialize_episode_mjcf(self, random_state):
    if hasattr(self._arena, 'regenerate'):
      self._arena.regenerate(random_state)
    for _, target in self._targets:
      target.detach()
    positions = np.copy(self._target_positions)
    random_state.shuffle(positions)
    self._targets = self._build_targets(random_state)
    for pos, (_, target) in zip(positions, self._targets):
      self._arena.attach(target)
      target.geom.pos = pos
      target.initialize_episode_mjcf(random_state)

  def _scatter_targets(self, physics, random_state=np.random):
    """Re-draws target positions and clears the touch protocol."""
    self._target_positions = [
        (self._target_area[0] * random_state.uniform(-1., 1.),
         self._target_area[1] * random_state.uniform(-1., 1.),
         self._z_height)
        for _ in self._target_positions]
    positions = np.copy(self._target_positions)
    random_state.shuffle(positions)
    for pos, (_, target) in zip(positions, self._targets):
      target.reset(physics)
      physics.bind(target.geom).pos = pos
    self._rewarded.clear()
    self._first_touch_time = None
    self._second_touch_time = None
    self._do_time_out = False
    self._state = TwoTouchState.PRE_TOUCH

  def _respawn_walker(self, physics, random_state):
    self._walker.reinitialize_pose(physics, random_state)
    if self._randomize_spawn_position:
      self._spawn_position = self._arena.spawn_positions[
          random_state.randint(0, len(self._arena.spawn_positions))]
    quat = None
    if self._randomize_spawn_rotation:
      angle = 2 * np.pi * random_state.uniform()
      quat = [np.cos(angle / 2), 0, 0, np.sin(angle / 2)]
    self._walker.shift_pose(
        physics,
        [self._spawn_position[0], self._spawn_position[1], 0.0],
        quat, rotate_velocity=True)

  def initialize_episode(self, physics, random_state):
    self._respawn_walker(physics, random_state)
    self._state = TwoTouchState.PRE_TOUCH
    self._discount = 1.0
    self._scatter_targets(physics, random_state)
    self._needs_rescatter = False
    hand_geoms = list(self._lhand_geoms) + list(self._rhand_geoms)
    for _, target in self._targets:
      target.register_collision_geoms(hand_geoms)

  # -------------------------------------------------- stepping

  def before_step(self, physics, action, random_state):
    self._walker.apply_action(physics, action, random_state)
    if self._needs_rescatter:
      self._scatter_targets(physics, random_state)
      self._needs_rescatter = False

  def should_terminate_episode(self, physics):
    del physics
    return False

  def _closeness_shaping(self, physics):
    """Dense exp(-3*L1) pull of the closer hand toward the target."""
    goal = np.array(physics.bind(self._targets[0][1].geom).xpos)
    gaps = [np.sum(np.abs(np.array(physics.bind(body).xpos) - goal))
            for body in (self._lhand_body, self._rhand_body)]
    return float(np.exp(-3. * min(gaps)))

  def _collect_touches(self, stage, physics):
    """Reward for targets newly activated at `stage` (0=first touch,
    1=second); updates state/touch clocks via the caller."""
    reward = 0.
    touched = False
    for index, (target_type, target) in enumerate(self._targets):
      key = (stage, target_type, index)
      if target.activated[stage] and not self._rewarded.get(key):
        self._rewarded[key] = True
        touched = True
        if stage == 0:
          reward += self._target_type_rewards[target_type]
        else:
          gap = self._second_touch_time - self._first_touch_time
          if gap < self._touch_interval - self._interval_tolerance:
            self._do_time_out = True
            self._state = TwoTouchState.TOUCHED_TOO_SOON
          elif gap <= self._touch_interval + self._interval_tolerance:
            reward += self._target_type_rewards[target_type]
    return reward, touched

  def get_reward(self, physics):
    reward = self._aliveness_reward
    reward += (.01 * self._closeness_shaping(physics) *
               self._target_type_rewards[0])
    now = physics.time()

    if self._state == TwoTouchState.PRE_TOUCH:
      earned, touched = self._collect_touches(0, physics)
      if touched:
        self._first_touch_time = now
        self._state = TwoTouchState.TOUCHED_ONCE
      reward += earned
    elif self._state == TwoTouchState.TOUCHED_ONCE:
      self._second_touch_time = now
      earned, touched = self._collect_touches(1, physics)
      if touched:
        self._state = max(self._state, TwoTouchState.TOUCHED_TWICE)
      reward += earned
      if (not touched and now - self._first_touch_time
          > self._touch_interval + self._interval_tolerance):
        self._do_time_out = True
        self._state = TwoTouchState.NO_SECOND_TOUCH
        self._second_touch_time = now
    else:
      # terminal protocol states: hold through the timeout, then
      # schedule a fresh target
      if self._do_time_out:
        if now > self._second_touch_time + self._failure_timeout:
          self._do_time_out = False
      elif now > self._second_touch_time + self._reset_delay:
        self._needs_rescatter = True
    return float(reward)

  def get_discount(self, physics):
    del physics
    return self._discount
