"""Tasks involving assembly and/or disassembly of bricks
(reference manipulation/bricks.py:15-710)."""

import collections

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu.composer import initializers
from dm_control_tpu.composer import variation
from dm_control_tpu.composer.observation import observable
from dm_control_tpu.composer.variation import distributions
from dm_control_tpu.entities import props
from dm_control_tpu.manipulation.shared import arenas
from dm_control_tpu.manipulation.shared import cameras
from dm_control_tpu.manipulation.shared import constants
from dm_control_tpu.manipulation.shared import observations
from dm_control_tpu.manipulation.shared import registry
from dm_control_tpu.manipulation.shared import robots
from dm_control_tpu.manipulation.shared import tags
from dm_control_tpu.manipulation.shared import workspaces
from dm_control_tpu.utils import rewards
from dm_control_tpu.utils import transformations

_BrickWorkspace = collections.namedtuple(
    '_BrickWorkspace',
    ['prop_bbox', 'tcp_bbox', 'goal_hint_pos', 'goal_hint_quat',
     'arm_offset'])

_PROP_Z_OFFSET = 1e-6

_WORKSPACE = _BrickWorkspace(
    prop_bbox=workspaces.BoundingBox(
        lower=(-0.1, -0.1, _PROP_Z_OFFSET),
        upper=(0.1, 0.1, _PROP_Z_OFFSET)),
    tcp_bbox=workspaces.BoundingBox(
        lower=(-0.1, -0.1, 0.15), upper=(0.1, 0.1, 0.4)),
    goal_hint_pos=(0.2, 0.1, 0.),
    goal_hint_quat=(-0.38268343, 0., 0., 0.92387953),
    arm_offset=robots.ARM_OFFSET)

_HINT_ALPHA = 0.75
_CLOSE_THRESHOLD = 0.01
_CLICK_THRESHOLD = 0.001

_COLOR_VALUES, _COLOR_NAMES = list(
    zip(
        ((1., 0., 0.), 'red'),
        ((0., 1., 0.), 'green'),
        ((0., 0., 1.), 'blue'),
        ((0., 1., 1.), 'cyan'),
        ((1., 0., 1.), 'magenta'),
        ((1., 1., 0.), 'yellow'),
    ))


class _Common(composer.Task):
  """Common components of brick tasks."""

  def __init__(self, arena, arm, hand, num_bricks, obs_settings,
               workspace, control_timestep):
    if not 2 <= num_bricks <= 6:
      raise ValueError(
          f'`num_bricks` must be between 2 and 6, got {num_bricks}.')

    self._arena = arena
    self._arm = arm
    self._hand = hand
    self._arm.attach(self._hand)
    self._arena.attach_offset(self._arm, offset=workspace.arm_offset)
    self.control_timestep = control_timestep

    self._task_observables = cameras.add_camera_observables(
        arena, obs_settings, cameras.FRONT_CLOSE)

    color_sequence = iter(_COLOR_VALUES)
    brick_obs_options = observations.make_options(
        obs_settings, observations.FREEPROP_OBSERVABLES)

    bricks = []
    brick_frames = []
    goal_hint_bricks = []
    for _ in range(num_bricks):
      color = next(color_sequence)
      brick = props.Duplo(color=color,
                          observable_options=brick_obs_options)
      brick_frames.append(arena.add_free_entity(brick))
      bricks.append(brick)
      # translucent contactless mocap bricks visualize the goal state
      hint_brick = props.Duplo(color=color)
      _hintify(hint_brick, alpha=_HINT_ALPHA)
      arena.attach(hint_brick)
      goal_hint_bricks.append(hint_brick)

    self._bricks = bricks
    self._brick_frames = brick_frames
    self._goal_hint_bricks = goal_hint_bricks
    self._goal_hint_pos = workspace.goal_hint_pos
    self._goal_hint_quat = workspace.goal_hint_quat

    self._tcp_initializer = initializers.ToolCenterPointInitializer(
        self._hand, self._arm,
        position=distributions.Uniform(*workspace.tcp_bbox),
        quaternion=workspaces.DOWN_QUATERNION)

    workspaces.add_bbox_site(
        body=self.root_entity.mjcf_model.worldbody,
        lower=workspace.tcp_bbox.lower, upper=workspace.tcp_bbox.upper,
        rgba=constants.GREEN, name='tcp_spawn_area')
    workspaces.add_bbox_site(
        body=self.root_entity.mjcf_model.worldbody,
        lower=workspace.prop_bbox.lower,
        upper=workspace.prop_bbox.upper,
        rgba=constants.BLUE, name='prop_spawn_area')

  @property
  def task_observables(self):
    return self._task_observables

  @property
  def root_entity(self):
    return self._arena

  @property
  def arm(self):
    return self._arm

  @property
  def hand(self):
    return self._hand


class Stack(_Common):
  """Build a stack of Duplo bricks."""

  def __init__(self, arena, arm, hand, num_bricks, target_height,
               moveable_base, randomize_order, obs_settings, workspace,
               control_timestep):
    if not 2 <= target_height <= num_bricks:
      raise ValueError(
          f'`target_height` must be between 2 and {num_bricks}, '
          f'got {target_height}.')
    super().__init__(arena=arena, arm=arm, hand=hand,
                     num_bricks=num_bricks, obs_settings=obs_settings,
                     workspace=workspace,
                     control_timestep=control_timestep)
    self._moveable_base = moveable_base
    self._randomize_order = randomize_order
    self._target_height = target_height
    self._prop_bbox = workspace.prop_bbox
    self._desired_order = np.arange(target_height)

    if randomize_order:
      desired_order_observable = observable.Generic(
          self._get_desired_order)
      desired_order_observable.configure(
          **obs_settings.prop_pose._asdict())
      self._task_observables['desired_order'] = desired_order_observable

  def _get_desired_order(self, physics):
    del physics
    return self._desired_order.astype(np.double)

  def initialize_episode_mjcf(self, random_state):
    if self._randomize_order:
      self._desired_order = random_state.choice(
          len(self._bricks), size=self._target_height, replace=False)
    fixed_indices = ([] if self._moveable_base
                     else [self._desired_order[0]])
    _add_or_remove_freejoints(attachment_frames=self._brick_frames,
                              fixed_indices=fixed_indices)
    # PropPlacer discovers freejoints at construction, so build it after
    # the freejoint shuffle above
    self._brick_placer = initializers.PropPlacer(
        props=self._bricks,
        position=distributions.Uniform(*self._prop_bbox),
        quaternion=workspaces.uniform_z_rotation,
        settle_physics=True)

  def initialize_episode(self, physics, random_state):
    self._brick_placer(physics, random_state)
    self._hand.set_grasp(physics, close_factors=random_state.uniform())
    self._tcp_initializer(physics, random_state)
    _build_stack(physics, bricks=self._goal_hint_bricks,
                 base_pos=self._goal_hint_pos,
                 base_quat=self._goal_hint_quat,
                 order=self._desired_order, random_state=random_state)

  def get_reward(self, physics):
    pairs = list(zip(self._desired_order[:-1],
                     self._desired_order[1:]))
    pairwise_rewards = _get_pairwise_stacking_rewards(
        physics=physics, bricks=self._bricks, pairs=pairs)
    return np.mean(pairwise_rewards)


class Reassemble(_Common):
  """Disassemble a stack of bricks and reassemble in another order."""

  def __init__(self, arena, arm, hand, num_bricks,
               randomize_initial_order, randomize_desired_order,
               obs_settings, workspace, control_timestep):
    super().__init__(arena=arena, arm=arm, hand=hand,
                     num_bricks=num_bricks, obs_settings=obs_settings,
                     workspace=workspace,
                     control_timestep=control_timestep)
    self._randomize_initial_order = randomize_initial_order
    self._randomize_desired_order = randomize_desired_order
    self._initial_order = np.arange(num_bricks)
    self._desired_order = self._initial_order.copy()
    self._desired_order[1:] = self._desired_order[-1:0:-1]

    if randomize_desired_order:
      desired_order_observable = observable.Generic(
          self._get_desired_order)
      desired_order_observable.configure(
          **obs_settings.prop_pose._asdict())
      self._task_observables['desired_order'] = desired_order_observable

    self._base_pos = distributions.Uniform(*workspace.prop_bbox)
    self._base_quat = workspaces.uniform_z_rotation

  def _get_desired_order(self, physics):
    del physics
    return self._desired_order.astype(np.double)

  def initialize_episode_mjcf(self, random_state):
    if self._randomize_initial_order:
      random_state.shuffle(self._initial_order)
    # the bottom brick is welded, so it is shared between both orders
    self._desired_order[0] = self._initial_order[0]
    self._desired_order[1:] = self._initial_order[-1:0:-1]
    if self._randomize_desired_order:
      random_state.shuffle(self._desired_order[1:])
    _add_or_remove_freejoints(attachment_frames=self._brick_frames,
                              fixed_indices=[self._initial_order[0]])

  def initialize_episode(self, physics, random_state):
    _build_stack(physics, bricks=self._bricks, base_pos=self._base_pos,
                 base_quat=self._base_quat, order=self._initial_order,
                 random_state=random_state)
    _build_stack(physics, bricks=self._goal_hint_bricks,
                 base_pos=self._goal_hint_pos,
                 base_quat=self._goal_hint_quat,
                 order=self._desired_order, random_state=random_state)
    self._hand.set_grasp(physics, close_factors=random_state.uniform())
    self._tcp_initializer(physics, random_state)

  def get_reward(self, physics):
    pairs = list(zip(self._desired_order[:-1],
                     self._desired_order[1:]))
    # close_coef=0: the coarse shaping term would penalize breaking up
    # the initial stack
    pairwise_rewards = _get_pairwise_stacking_rewards(
        physics=physics, bricks=self._bricks, pairs=pairs, close_coef=0.)
    return np.mean(pairwise_rewards)


def _distance(pos1, pos2):
  diff = pos1 - pos2
  return sum(np.sqrt((diff * diff).sum(1)))


def _min_stud_to_hole_distance(physics, bottom_brick, top_brick):
  # bricks are rotationally symmetric: measure both alignments and take
  # the smaller
  stud_pos = physics.bind(
      list(bottom_brick.studs[[0, -1], [0, -1]])).xpos
  hole_pos = physics.bind(list(top_brick.holes[[0, -1], [0, -1]])).xpos
  dist1 = _distance(stud_pos, hole_pos)
  dist2 = _distance(stud_pos[::-1], hole_pos)
  return min(dist1, dist2)


def _get_pairwise_stacking_rewards(physics, bricks, pairs,
                                   close_coef=0.1):
  """Shaping components in (0, 1] per brick pair; 1 = stacked."""
  distances = []
  for bottom_idx, top_idx in pairs:
    distances.append(_min_stud_to_hole_distance(
        physics, bricks[bottom_idx], bricks[top_idx]))
  distances = np.hstack(distances)
  close = rewards.tolerance(
      distances, bounds=(0, _CLOSE_THRESHOLD),
      margin=(_CLOSE_THRESHOLD * 10))
  clicked = rewards.tolerance(
      distances, bounds=(0, _CLICK_THRESHOLD), margin=_CLICK_THRESHOLD)
  return np.average([close, clicked], weights=[close_coef, 1.], axis=0)


def _build_stack(physics, bricks, base_pos, base_quat, order,
                 random_state):
  """Poses `bricks` as a stack (holes onto studs) in `order`."""
  base_pos = variation.evaluate(base_pos, random_state=random_state)
  base_quat = variation.evaluate(base_quat, random_state=random_state)
  bricks[order[0]].set_pose(physics, position=base_pos,
                            quaternion=base_quat)
  for bottom_idx, top_idx in zip(order[:-1], order[1:]):
    bottom = bricks[bottom_idx]
    top = bricks[top_idx]
    stud_pos = np.array(physics.bind(bottom.studs[0, 0]).xpos)
    _, quat = bottom.get_pose(physics)
    # 50% of the time rotate the top brick 180 degrees (the reward is
    # symmetric under this)
    if random_state.rand() < 0.5:
      half_turn = np.array([0., 0., 0., 1.])  # angle pi about z
      quat = np.asarray(transformations.quat_mul(quat, half_turn))
      hole_idx = (-1, -1)
    else:
      hole_idx = (0, 0)
    top.set_pose(physics, quaternion=quat)
    physics.forward()
    offset = np.array(physics.bind(top.holes[hole_idx]).xpos)
    top_pos, _ = top.get_pose(physics)
    top.set_pose(physics, position=np.array(top_pos) +
                 (stud_pos - offset))
    physics.forward()


def _add_or_remove_freejoints(attachment_frames, fixed_indices):
  """Removes freejoints on fixed frames, ensures them elsewhere."""
  for i, frame in enumerate(attachment_frames):
    free = frame.get_children('freejoint')
    if i in fixed_indices:
      for j in free:
        j.remove()
    elif not free:
      frame.add('freejoint')


def _replace_alpha(rgba, alpha=0.3):
  new_rgba = np.array(rgba, copy=True, dtype=float)
  new_rgba[3] = alpha
  return new_rgba


def _hintify(entity, alpha=None):
  """Disables contacts, converts bodies to mocap, overrides alpha."""
  for subentity in entity.iter_entities():
    if (alpha is not None
        and subentity.mjcf_model.default.geom is not None
        and subentity.mjcf_model.default.geom.rgba is not None):
      subentity.mjcf_model.default.geom.rgba = _replace_alpha(
          subentity.mjcf_model.default.geom.rgba, alpha=alpha)
    for body in subentity.mjcf_model.find_all('body'):
      body.mocap = 'true'
    for geom in subentity.mjcf_model.find_all('geom'):
      if alpha is not None and geom.rgba is not None:
        geom.rgba = _replace_alpha(geom.rgba, alpha=alpha)
      geom.contype = 0
      geom.conaffinity = 0


def _stack(obs_settings, num_bricks, moveable_base, randomize_order,
           target_height=None):
  """Configure and instantiate a Stack task."""
  if target_height is None:
    target_height = num_bricks
  arena = arenas.Standard()
  arm = robots.make_arm(obs_settings=obs_settings)
  hand = robots.make_hand(obs_settings=obs_settings)
  return Stack(arena=arena, arm=arm, hand=hand, num_bricks=num_bricks,
               target_height=target_height, moveable_base=moveable_base,
               randomize_order=randomize_order,
               obs_settings=obs_settings, workspace=_WORKSPACE,
               control_timestep=constants.CONTROL_TIMESTEP)


@registry.add(tags.FEATURES)
def stack_2_bricks_features():
  return _stack(obs_settings=observations.PERFECT_FEATURES,
                num_bricks=2, moveable_base=False, randomize_order=False)


@registry.add(tags.VISION)
def stack_2_bricks_vision():
  return _stack(obs_settings=observations.VISION, num_bricks=2,
                moveable_base=False, randomize_order=False)


@registry.add(tags.FEATURES)
def stack_2_bricks_moveable_base_features():
  return _stack(obs_settings=observations.PERFECT_FEATURES,
                num_bricks=2, moveable_base=True, randomize_order=False)


@registry.add(tags.VISION)
def stack_2_bricks_moveable_base_vision():
  return _stack(obs_settings=observations.VISION, num_bricks=2,
                moveable_base=True, randomize_order=False)


@registry.add(tags.FEATURES)
def stack_3_bricks_features():
  return _stack(obs_settings=observations.PERFECT_FEATURES,
                num_bricks=3, moveable_base=False, randomize_order=False)


@registry.add(tags.VISION)
def stack_3_bricks_vision():
  return _stack(obs_settings=observations.VISION, num_bricks=3,
                moveable_base=False, randomize_order=False)


@registry.add(tags.FEATURES)
def stack_3_bricks_random_order_features():
  return _stack(obs_settings=observations.PERFECT_FEATURES,
                num_bricks=3, moveable_base=False, randomize_order=True)


@registry.add(tags.FEATURES)
def stack_2_of_3_bricks_random_order_features():
  return _stack(obs_settings=observations.PERFECT_FEATURES,
                num_bricks=3, moveable_base=False, randomize_order=True,
                target_height=2)


@registry.add(tags.VISION)
def stack_2_of_3_bricks_random_order_vision():
  return _stack(obs_settings=observations.VISION, num_bricks=3,
                moveable_base=False, randomize_order=True,
                target_height=2)


def _reassemble(obs_settings, num_bricks, randomize_initial_order,
                randomize_desired_order):
  """Configure and instantiate a `Reassemble` task."""
  arena = arenas.Standard()
  arm = robots.make_arm(obs_settings=obs_settings)
  hand = robots.make_hand(obs_settings=obs_settings)
  return Reassemble(arena=arena, arm=arm, hand=hand,
                    num_bricks=num_bricks,
                    randomize_initial_order=randomize_initial_order,
                    randomize_desired_order=randomize_desired_order,
                    obs_settings=obs_settings, workspace=_WORKSPACE,
                    control_timestep=constants.CONTROL_TIMESTEP)


@registry.add(tags.FEATURES)
def reassemble_3_bricks_fixed_order_features():
  return _reassemble(obs_settings=observations.PERFECT_FEATURES,
                     num_bricks=3, randomize_initial_order=False,
                     randomize_desired_order=False)


@registry.add(tags.VISION)
def reassemble_3_bricks_fixed_order_vision():
  return _reassemble(obs_settings=observations.VISION, num_bricks=3,
                     randomize_initial_order=False,
                     randomize_desired_order=False)


@registry.add(tags.FEATURES)
def reassemble_5_bricks_random_order_features():
  return _reassemble(obs_settings=observations.PERFECT_FEATURES,
                     num_bricks=5, randomize_initial_order=True,
                     randomize_desired_order=True)


@registry.add(tags.VISION)
def reassemble_5_bricks_random_order_vision():
  return _reassemble(obs_settings=observations.VISION, num_bricks=5,
                     randomize_initial_order=True,
                     randomize_desired_order=True)
