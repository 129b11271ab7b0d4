"""Lift tasks: elevate a prop above its settled height.

Behavioral contract: reference manipulation/lift.py — same registered
names (lift_{brick,large_box}_{features,vision}), spawn regions, box
mass/size, lift distance, and linear shaped reward measured at the
prop's lowest vertex. Built on the shared Workcell.
"""

import itertools

import numpy as np

from dm_control_tpu.composer import initializers
from dm_control_tpu.composer.variation import distributions
from dm_control_tpu.entities import props
from dm_control_tpu.manipulation.props import primitive as mprops
from dm_control_tpu.manipulation.shared import constants
from dm_control_tpu.manipulation.shared import observations
from dm_control_tpu.manipulation.shared import registry
from dm_control_tpu.manipulation.shared import tags
from dm_control_tpu.manipulation.shared import workcell
from dm_control_tpu.manipulation.shared import workspaces
from dm_control_tpu.utils import rewards

_LIFT_DISTANCE = 0.3
_BOX_HALF = 0.09   # deliberately too wide for a pinch grasp
_BOX_MASS = 1.3

_TCP_BBOX = workspaces.BoundingBox((-0.1, -0.1, 0.2), (0.1, 0.1, 0.4))

_SPAWN_Z = {'duplo': 0.0, 'box': _BOX_HALF}


def _vertex_sites_for(entity, box_like):
  """Adds a small site at each vertex of a box geom/site; returns them."""
  spans = ((-half, half) for half in box_like.size)
  corners = np.array(list(itertools.product(*spans)))
  if box_like.pos is not None:
    corners = corners + box_like.pos
  return [
      box_like.parent.add(
          'site', name=f'vertex_{i}', pos=pos, type='sphere',
          size=[0.002], rgba=constants.RED,
          group=constants.TASK_SITE_GROUP)
      for i, pos in enumerate(corners)]


class _TrackedBox(mprops.Box):
  """Box whose geom vertices carry marker sites."""

  def _build(self, *args, **kwargs):
    super()._build(*args, **kwargs)
    self.vertices = _vertex_sites_for(self, self.geom)


class _TrackedDuplo(props.Duplo):
  """Duplo whose bounding-site vertices carry marker sites."""

  def _build(self, *args, **kwargs):
    super()._build(*args, **kwargs)
    self.vertices = _vertex_sites_for(
        self, self.mjcf_model.find('site', 'bounding_box'))


class Lift(workcell.WorkcellTask):
  """Raise the prop _LIFT_DISTANCE above where it settled."""

  def __init__(self, cell, prop, prop_bbox):
    super().__init__(cell)
    self._prop = prop
    cell.add_free_prop(prop)
    self._prop_placer = initializers.PropPlacer(
        props=[prop], position=distributions.Uniform(*prop_bbox),
        quaternion=workspaces.uniform_z_rotation,
        ignore_collisions=True, settle_physics=True)
    self._goal_height = 0.0
    self._goal_marker = cell.mark_region(
        'target',
        workspaces.BoundingBox((-1, -1, 0), (1, 1, 0)),
        name='target_height')
    self._goal_marker.rgba = constants.RED
    cell.mark_region('prop', prop_bbox, name='prop_spawn_area')

  def _lowest_vertex_height(self, physics):
    return physics.bind(self._prop.vertices).xpos[:, 2].min()

  def initialize_episode(self, physics, random_state):
    self._cell.reset_hand(physics, random_state)
    self._prop_placer(physics, random_state)
    # goal is measured from wherever the prop settled
    self._goal_height = (
        self._lowest_vertex_height(physics) + _LIFT_DISTANCE)
    marker = physics.bind(self._goal_marker)
    marker.pos = np.array([*marker.pos[:2], self._goal_height])

  def get_reward(self, physics):
    return rewards.tolerance(
        self._lowest_vertex_height(physics),
        bounds=(self._goal_height, np.inf), margin=_LIFT_DISTANCE,
        value_at_margin=0, sigmoid='linear')


def _make_lift(obs_settings, prop_kind):
  cell = workcell.Workcell(obs_settings, tcp_bbox=_TCP_BBOX)
  if prop_kind == 'duplo':
    prop = _TrackedDuplo(observable_options=cell.prop_options())
  else:
    prop = _TrackedBox(half_lengths=[_BOX_HALF] * 3,
                       observable_options=cell.prop_options())
    prop.geom.mass = _BOX_MASS
  z = _SPAWN_Z[prop_kind]
  bbox = workspaces.BoundingBox((-0.1, -0.1, z), (0.1, 0.1, z))
  return Lift(cell, prop=prop, prop_bbox=bbox)


_REGISTRY_PROP_NAMES = {'duplo': 'brick', 'box': 'large_box'}

for _kind, _public in _REGISTRY_PROP_NAMES.items():
  for _tag, _settings in (('features', observations.PERFECT_FEATURES),
                          ('vision', observations.VISION)):
    registry.register(
        f'lift_{_public}_{_tag}',
        lambda s=_settings, k=_kind: _make_lift(s, k),
        _tag)
