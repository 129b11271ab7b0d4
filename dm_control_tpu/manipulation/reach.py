"""Reach tasks: bring the hand near a target prop or site.

Behavioral contract: reference manipulation/reach.py — same registered
names (reach_{duplo,site}_{features,vision}), spawn regions, target
radius, and shaped reward. Built on the shared Workcell.
"""

import numpy as np

from dm_control_tpu.composer import initializers
from dm_control_tpu.composer.observation import observable
from dm_control_tpu.composer.variation import distributions
from dm_control_tpu.entities import props
from dm_control_tpu.manipulation.shared import constants
from dm_control_tpu.manipulation.shared import observations
from dm_control_tpu.manipulation.shared import registry
from dm_control_tpu.manipulation.shared import tags
from dm_control_tpu.manipulation.shared import workcell
from dm_control_tpu.manipulation.shared import workspaces
from dm_control_tpu.utils import rewards

_RADIUS = 0.05
_Z_PAD = 0.001  # keeps spawned props clear of the tabletop

_BBOXES = {
    'duplo': dict(
        target=workspaces.BoundingBox((-0.1, -0.1, _Z_PAD),
                                      (0.1, 0.1, _Z_PAD)),
        tcp=workspaces.BoundingBox((-0.1, -0.1, 0.2), (0.1, 0.1, 0.4))),
    'site': dict(
        target=workspaces.BoundingBox((-0.2, -0.2, 0.02),
                                      (0.2, 0.2, 0.4)),
        tcp=workspaces.BoundingBox((-0.2, -0.2, 0.02),
                                   (0.2, 0.2, 0.4))),
}


class Reach(workcell.WorkcellTask):
  """Move the pinch point to a target (free prop or fixed site)."""

  def __init__(self, cell, prop, target_bbox):
    super().__init__(cell)
    target_position = distributions.Uniform(*target_bbox)
    self._prop = prop

    if prop is not None:
      # Reaching a prop: the (invisible) target site rides on it.
      self._target = self._add_target(prop, visible=False)
      cell.add_free_prop(prop)
      self._prop_placer = initializers.PropPlacer(
          props=[prop], position=target_position,
          quaternion=workspaces.uniform_z_rotation, settle_physics=True)
    else:
      # Reaching a site: visible, teleported per episode, observable.
      self._target = self._add_target(cell.arena, visible=True)
      self._site_position = target_position
      pos_obs = observable.MJCFFeature('pos', self._target)
      pos_obs.configure(**cell.obs_settings.prop_pose._asdict())
      self._task_observables['target_position'] = pos_obs

    cell.mark_region('target', target_bbox, name='target_spawn_area')

  def _add_target(self, entity, visible):
    return workspaces.add_target_site(
        body=entity.mjcf_model.worldbody, radius=_RADIUS,
        visible=visible, rgba=constants.RED, name='target_site')

  def initialize_episode(self, physics, random_state):
    self._cell.reset_hand(physics, random_state)
    if self._prop is not None:
      self._prop_placer(physics, random_state)
    else:
      physics.bind(self._target).pos = self._site_position(
          random_state=random_state)

  def get_reward(self, physics):
    gap = np.linalg.norm(
        physics.bind(self._hand_tcp()).xpos
        - physics.bind(self._target).xpos)
    return rewards.tolerance(gap, bounds=(0, _RADIUS), margin=_RADIUS)

  def _hand_tcp(self):
    return self._cell.hand.tool_center_point


def _make_reach(obs_settings, target_kind):
  boxes = _BBOXES[target_kind]
  cell = workcell.Workcell(obs_settings, tcp_bbox=boxes['tcp'])
  prop = None
  if target_kind == 'duplo':
    prop = props.Duplo(observable_options=cell.prop_options())
  return Reach(cell, prop=prop, target_bbox=boxes['target'])


for _kind in ('duplo', 'site'):
  for _tag, _settings in (('features', observations.PERFECT_FEATURES),
                          ('vision', observations.VISION)):
    registry.register(
        f'reach_{_kind}_{_tag}',
        lambda s=_settings, k=_kind: _make_reach(s, k),
        _tag, tags.EASY)
