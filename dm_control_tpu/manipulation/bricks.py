"""Brick stacking / restacking tasks.

Behavioral contract: reference manipulation/bricks.py — same 13
registered names, brick colors, spawn regions, goal-hint placement,
freejoint pinning of the base brick, and the stud-to-hole pairwise
shaped reward. Structured differently: a BrickSet helper owns the
colored bricks, their translucent goal-hint ghosts, freejoint pinning
and stack construction, while Stack/Reassemble are thin WorkcellTasks;
registration is one declarative table.
"""

import numpy as np

from dm_control_tpu.composer import initializers
from dm_control_tpu.composer import variation
from dm_control_tpu.composer.observation import observable
from dm_control_tpu.composer.variation import distributions
from dm_control_tpu.entities import props
from dm_control_tpu.manipulation.shared import observations
from dm_control_tpu.manipulation.shared import registry
from dm_control_tpu.manipulation.shared import workcell
from dm_control_tpu.manipulation.shared import workspaces
from dm_control_tpu.utils import rewards
from dm_control_tpu.utils import transformations

_TCP_BBOX = workspaces.BoundingBox((-0.1, -0.1, 0.15), (0.1, 0.1, 0.4))
_SPAWN_BBOX = workspaces.BoundingBox((-0.1, -0.1, 1e-6), (0.1, 0.1, 1e-6))
_HINT_POS = (0.2, 0.1, 0.)
_HINT_QUAT = (-0.38268343, 0., 0., 0.92387953)
_HINT_ALPHA = 0.75

# distance thresholds of the two shaping stages (m)
_NEAR = 0.01
_SNAPPED = 0.001

_PALETTE = ((1., 0., 0.), (0., 1., 0.), (0., 0., 1.),
            (0., 1., 1.), (1., 0., 1.), (1., 1., 0.))

_HALF_TURN_Z = np.array([0., 0., 0., 1.])  # quat: angle pi about z


def _ghostify(entity):
  """Turns an entity into a contactless translucent mocap 'hint'."""
  model = entity.mjcf_model
  geom_default = model.default.geom
  if geom_default is not None and geom_default.rgba is not None:
    geom_default.rgba = tuple(geom_default.rgba[:3]) + (_HINT_ALPHA,)
  for body in model.find_all('body'):
    body.mocap = 'true'
  for geom in model.find_all('geom'):
    if geom.rgba is not None:
      geom.rgba = tuple(geom.rgba[:3]) + (_HINT_ALPHA,)
    geom.contype = 0
    geom.conaffinity = 0


class BrickSet:
  """The colored bricks, their ghosts, and stack geometry helpers."""

  def __init__(self, cell, num_bricks):
    if not 2 <= num_bricks <= len(_PALETTE):
      raise ValueError(
          f'`num_bricks` must be between 2 and {len(_PALETTE)}, '
          f'got {num_bricks}.')
    opts = cell.prop_options()
    self.bricks = []
    self.ghosts = []
    self.frames = []
    for color in _PALETTE[:num_bricks]:
      brick = props.Duplo(color=color, observable_options=opts)
      self.frames.append(cell.add_free_prop(brick))
      self.bricks.append(brick)
      ghost = props.Duplo(color=color)
      _ghostify(ghost)
      cell.arena.attach(ghost)
      self.ghosts.append(ghost)

  def __len__(self):
    return len(self.bricks)

  def pin(self, pinned_indices):
    """Removes freejoints at `pinned_indices`, restores them elsewhere."""
    for i, frame in enumerate(self.frames):
      existing = frame.get_children('freejoint')
      if i in pinned_indices:
        for joint in existing:
          joint.remove()
      elif not existing:
        frame.add('freejoint')

  def scattered_placer(self):
    """A fresh PropPlacer (rebuilt after any freejoint edit)."""
    return initializers.PropPlacer(
        props=self.bricks,
        position=distributions.Uniform(*_SPAWN_BBOX),
        quaternion=workspaces.uniform_z_rotation, settle_physics=True)

  @staticmethod
  def _corner_sites(grid):
    """The four corner sites of a stud/hole grid, as a list."""
    return list(grid[[0, -1], [0, -1]])

  def coupling_distance(self, physics, bottom, top):
    """Total corner stud->hole distance, min over the two alignments.

    The brick is 180-degree symmetric about z, so the four bottom studs
    can mate with the four top holes in either of two orders.
    """
    studs = physics.bind(self._corner_sites(bottom.studs)).xpos
    holes = physics.bind(self._corner_sites(top.holes)).xpos

    def total(a, b):
      return np.sqrt(((a - b) ** 2).sum(axis=1)).sum()

    return min(total(studs, holes), total(studs[::-1], holes))

  def coupling_reward(self, physics, order, bricks=None, near_weight=0.1):
    """Mean over consecutive pairs of a two-stage shaping in (0, 1].

    `near` pulls the pair together from far away; `snapped` only
    saturates once the studs click into the holes. The weighted
    average matches reference bricks.py:`_get_pairwise_stacking_rewards`.
    """
    bricks = self.bricks if bricks is None else bricks
    gaps = np.hstack([
        self.coupling_distance(physics, bricks[lo], bricks[hi])
        for lo, hi in zip(order[:-1], order[1:])])
    near = rewards.tolerance(gaps, bounds=(0, _NEAR), margin=10 * _NEAR)
    snapped = rewards.tolerance(
        gaps, bounds=(0, _SNAPPED), margin=_SNAPPED)
    per_pair = (near_weight * near + snapped) / (near_weight + 1.)
    return np.mean(per_pair)

  def build_stack(self, physics, order, base_pos, base_quat,
                  random_state, ghosts=False):
    """Poses bricks (or their ghosts) as a mated stack in `order`."""
    bricks = self.ghosts if ghosts else self.bricks
    pos = variation.evaluate(base_pos, random_state=random_state)
    quat = variation.evaluate(base_quat, random_state=random_state)
    bricks[order[0]].set_pose(physics, position=pos, quaternion=quat)
    for lo, hi in zip(order[:-1], order[1:]):
      bottom, top = bricks[lo], bricks[hi]
      stud = np.array(physics.bind(bottom.studs[0, 0]).xpos)
      _, quat = bottom.get_pose(physics)
      quat = np.asarray(quat)
      # either brick orientation mates; flip a coin (reward-invariant)
      if random_state.rand() < 0.5:
        quat = np.asarray(transformations.quat_mul(quat, _HALF_TURN_Z))
        hole_idx = (-1, -1)
      else:
        hole_idx = (0, 0)
      top.set_pose(physics, quaternion=quat)
      physics.forward()
      hole = np.array(physics.bind(top.holes[hole_idx]).xpos)
      top_pos, _ = top.get_pose(physics)
      top.set_pose(physics, position=np.array(top_pos) + stud - hole)
      physics.forward()


class _BrickTask(workcell.WorkcellTask):
  """Shared plumbing: workcell + brick set + order observable."""

  def __init__(self, obs_settings, num_bricks):
    cell = workcell.Workcell(obs_settings, tcp_bbox=_TCP_BBOX)
    super().__init__(cell)
    self._set = BrickSet(cell, num_bricks)
    cell.mark_region('prop', _SPAWN_BBOX, name='prop_spawn_area')

  def _expose_order_observable(self, obs_settings):
    order_obs = observable.Generic(
        lambda physics: np.asarray(self._desired_order, dtype=np.double))
    order_obs.configure(**obs_settings.prop_pose._asdict())
    self._task_observables['desired_order'] = order_obs

  def _place_goal_hints(self, physics, random_state):
    self._set.build_stack(
        physics, self._desired_order, base_pos=_HINT_POS,
        base_quat=_HINT_QUAT, random_state=random_state, ghosts=True)


class Stack(_BrickTask):
  """Stack `target_height` of the scattered bricks in a given order."""

  def __init__(self, obs_settings, num_bricks, target_height=None,
               moveable_base=False, randomize_order=False):
    target_height = num_bricks if target_height is None else target_height
    if not 2 <= target_height <= num_bricks:
      raise ValueError(
          f'`target_height` must be between 2 and {num_bricks}, '
          f'got {target_height}.')
    super().__init__(obs_settings, num_bricks)
    self._moveable_base = moveable_base
    self._randomize_order = randomize_order
    self._desired_order = np.arange(target_height)
    if randomize_order:
      self._expose_order_observable(obs_settings)

  def initialize_episode_mjcf(self, random_state):
    if self._randomize_order:
      self._desired_order = random_state.choice(
          len(self._set), size=len(self._desired_order), replace=False)
    self._set.pin([] if self._moveable_base else [self._desired_order[0]])
    # placer caches freejoints, so rebuild it after pin()
    self._placer = self._set.scattered_placer()

  def initialize_episode(self, physics, random_state):
    # posing the arm first keeps the settle numerically benign: at
    # qpos0 the folded Jaco self-penetrates deeply (the C engine
    # rides this out in f64; the f32 device solver should not have to)
    self._cell.reset_hand(physics, random_state)
    self._placer(physics, random_state)
    self._place_goal_hints(physics, random_state)

  def get_reward(self, physics):
    return self._set.coupling_reward(physics, self._desired_order)


class Reassemble(_BrickTask):
  """Take an existing stack apart and rebuild it in a new order."""

  def __init__(self, obs_settings, num_bricks,
               randomize_initial_order=False,
               randomize_desired_order=False):
    super().__init__(obs_settings, num_bricks)
    self._randomize_initial_order = randomize_initial_order
    self._randomize_desired_order = randomize_desired_order
    self._initial_order = np.arange(num_bricks)
    self._desired_order = np.concatenate(
        [self._initial_order[:1], self._initial_order[:0:-1]])
    if randomize_desired_order:
      self._expose_order_observable(obs_settings)
    self._base_pos = distributions.Uniform(*_SPAWN_BBOX)
    self._base_quat = workspaces.uniform_z_rotation

  def initialize_episode_mjcf(self, random_state):
    if self._randomize_initial_order:
      random_state.shuffle(self._initial_order)
    # base brick is pinned, so both orders share it
    self._desired_order = np.concatenate(
        [self._initial_order[:1], self._initial_order[:0:-1]])
    if self._randomize_desired_order:
      random_state.shuffle(self._desired_order[1:])
    self._set.pin([self._initial_order[0]])

  def initialize_episode(self, physics, random_state):
    self._set.build_stack(
        physics, self._initial_order, base_pos=self._base_pos,
        base_quat=self._base_quat, random_state=random_state)
    self._place_goal_hints(physics, random_state)
    self._cell.reset_hand(physics, random_state)

  def get_reward(self, physics):
    # near_weight=0: coarse shaping would punish dismantling the stack
    return self._set.coupling_reward(
        physics, self._desired_order, near_weight=0.)


# name -> (class, kwargs, also_vision)
_CATALOG = {
    'stack_2_bricks': (Stack, dict(num_bricks=2), True),
    'stack_2_bricks_moveable_base':
        (Stack, dict(num_bricks=2, moveable_base=True), True),
    'stack_3_bricks': (Stack, dict(num_bricks=3), True),
    'stack_3_bricks_random_order':
        (Stack, dict(num_bricks=3, randomize_order=True), False),
    'stack_2_of_3_bricks_random_order':
        (Stack, dict(num_bricks=3, target_height=2,
                     randomize_order=True), True),
    'reassemble_3_bricks_fixed_order':
        (Reassemble, dict(num_bricks=3), True),
    'reassemble_5_bricks_random_order':
        (Reassemble, dict(num_bricks=5, randomize_initial_order=True,
                          randomize_desired_order=True), True),
}

for _name, (_cls, _kwargs, _vision) in _CATALOG.items():
  _variants = [('features', observations.PERFECT_FEATURES)]
  if _vision:
    _variants.append(('vision', observations.VISION))
  for _tag, _settings in _variants:
    registry.register(
        f'{_name}_{_tag}',
        lambda c=_cls, s=_settings, kw=_kwargs: c(obs_settings=s, **kw),
        _tag)
