"""Place tasks: set a Duplo brick down on an elevated perch.

Behavioral contract: reference manipulation/place.py — same registered
names (place_{brick,cradle}_{features,vision}), pedestal geometry,
spawn regions, and the grasp/in-place/hand-away shaped reward. Built
on the shared Workcell; the pedestal is one parametrized entity with a
selectable top (flat duplo vs. sphere cradle) instead of two wired-up
entity classes.
"""

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu import mjcf
from dm_control_tpu.composer import define
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

_SUCCESS_RADIUS = 0.05
_PILLAR_RADIUS = 0.07
_PILLAR_HEIGHT = 0.2
_Z_PAD = 1e-6

_TCP_BBOX = workspaces.BoundingBox(
    (-0.1, -0.1, _PILLAR_RADIUS + 0.1), (0.1, 0.1, 0.4))
_PROP_BBOX = workspaces.BoundingBox(
    (-0.1, -0.1, _Z_PAD), (0.1, 0.1, _Z_PAD))
_PERCH_BBOX = workspaces.BoundingBox(
    (-0.1, -0.1, _PILLAR_RADIUS), (0.1, 0.1, _PILLAR_RADIUS + 0.1))


def _sphere_cradle():
  """Three spheres in a tripod: a concave rest for easy placement."""
  root = mjcf.RootElement(model='cradle')
  r = 0.7 * _PILLAR_RADIUS
  for ang in np.linspace(0., 2. * np.pi, num=3, endpoint=False):
    root.worldbody.add(
        'geom', type='sphere', size=[r], condim=6,
        pos=0.7 * r * np.array([np.sin(ang), np.cos(ang), -1.]))
  return composer.ModelWrapperEntity(root)


class Perch(composer.Entity):
  """Capsule pillar carrying a resting surface and the target site."""

  def _build(self, top_entity):
    self._mjcf_root = mjcf.RootElement(model='perch')
    world = self._mjcf_root.worldbody
    world.add(
        'geom', type='capsule', size=[_PILLAR_RADIUS],
        fromto=[0, 0, -_PILLAR_RADIUS,
                0, 0, -(_PILLAR_HEIGHT + _PILLAR_RADIUS)])
    mount = world.add('site', type='sphere', size=[0.003],
                      group=constants.TASK_SITE_GROUP)
    self.attach(top_entity, mount)
    self._target_site = workspaces.add_target_site(
        body=world, radius=_SUCCESS_RADIUS, rgba=constants.RED)

  @property
  def mjcf_model(self):
    return self._mjcf_root

  @property
  def target_site(self):
    return self._target_site

  def _build_observables(self):
    return _PerchObservables(self)


class _PerchObservables(composer.Observables):

  @define.observable
  def position(self):
    return observable.MJCFFeature('xpos', self._entity.target_site)


def _staged_place_reward(tcp_to_obj, obj_to_target, tcp_to_target):
  """Grasp-shaped until near the target, then rewards letting go.

  All three inputs are scalar distances. Matches the reference reward
  (place.py:202-224): in_place dominates with weight 10; the residual
  term morphs from "be near the prop" into "move the hand away" as
  in_place saturates.
  """
  long_tail = dict(margin=_SUCCESS_RADIUS, sigmoid='long_tail')
  grasp = rewards.tolerance(
      tcp_to_obj, bounds=(0, _SUCCESS_RADIUS), **long_tail)
  in_place = rewards.tolerance(
      obj_to_target, bounds=(0, _SUCCESS_RADIUS), **long_tail)
  hand_away = rewards.tolerance(
      tcp_to_target, bounds=(4 * _SUCCESS_RADIUS, np.inf),
      margin=3 * _SUCCESS_RADIUS, sigmoid='long_tail')
  residual = grasp * (1 - in_place) + hand_away * in_place
  return (residual + 10. * in_place) / 11.


class Place(workcell.WorkcellTask):
  """Pick up the brick and rest it on the perch."""

  def __init__(self, cell, prop, perch):
    super().__init__(cell)
    self._prop = prop
    self._prop_frame = cell.add_free_prop(prop)
    self._perch = perch
    cell.arena.attach(perch)
    cell.configure_prop_pose(perch.observables.as_dict())

    self._prop_placer = initializers.PropPlacer(
        props=[prop], position=distributions.Uniform(*_PROP_BBOX),
        quaternion=workspaces.uniform_z_rotation,
        settle_physics=True, max_attempts_per_prop=50)
    self._perch_placer = initializers.PropPlacer(
        props=[perch], position=distributions.Uniform(*_PERCH_BBOX),
        settle_physics=False)

    cell.mark_region('prop', _PROP_BBOX, name='prop_spawn_area')
    cell.mark_region('pedestal', _PERCH_BBOX, name='pedestal_spawn_area')

  def initialize_episode(self, physics, random_state):
    self._perch_placer(physics, random_state,
                       ignore_contacts_with_entities=[self._prop])
    self._cell.reset_hand(physics, random_state)
    self._prop_placer(physics, random_state)

  def get_reward(self, physics):
    target = physics.bind(self._perch.target_site).xpos
    obj = physics.bind(self._prop_frame).xpos
    tcp = physics.bind(self._cell.hand.tool_center_point).xpos
    return _staged_place_reward(
        tcp_to_obj=np.linalg.norm(obj - tcp),
        obj_to_target=np.linalg.norm(obj - target),
        tcp_to_target=np.linalg.norm(tcp - target))


def _make_place(obs_settings, perch_kind):
  cell = workcell.Workcell(obs_settings, tcp_bbox=_TCP_BBOX)
  prop = props.Duplo(observable_options=cell.prop_options())
  top = props.Duplo() if perch_kind == 'brick' else _sphere_cradle()
  return Place(cell, prop=prop, perch=Perch(top_entity=top))


for _kind in ('brick', 'cradle'):
  for _tag, _settings in (('features', observations.PERFECT_FEATURES),
                          ('vision', observations.VISION)):
    registry.register(
        f'place_{_kind}_{_tag}',
        lambda s=_settings, k=_kind: _make_place(s, k),
        _tag)
