"""mjcf.Physics: compile an MJCF object model and bind() its elements.

Behavioural counterpart of reference dm_control/mjcf/physics.py:243-652:
`Physics.from_mjcf_model(root)` compiles the tree through the TPU model
pipeline, and `physics.bind(element)` returns an attribute view of the
model/data rows owned by that element. Reads of derived quantities
after writes trigger a lazy forward() (the dirty protocol of
SURVEY.md §3.4).
"""

from __future__ import annotations

from typing import Sequence, Union

import numpy as np

from dm_control_tpu.models import constants
from dm_control_tpu.mjcf import element as element_lib
from dm_control_tpu.mujoco import engine


# namespace -> {attribute name: (kind, data field, needs_forward)}
_BIND_ATTRS = {
    'joint': {
        'qpos': ('data_ragged', 'qpos', False),
        'qvel': ('data_ragged', 'qvel', False),
        'qacc': ('data_ragged', 'qacc', True),
        'damping': ('model_dof', 'dof_damping', False),
        'armature': ('model_dof', 'dof_armature', False),
        'stiffness': ('model_jnt', 'jnt_stiffness', False),
        'range': ('model_jnt', 'jnt_range', False),
        'xanchor': ('data_jnt', 'xanchor', True),
        'xaxis': ('data_jnt', 'xaxis', True),
    },
    'geom': {
        'xpos': ('data_named', 'geom_xpos', True),
        'xmat': ('data_named', 'geom_xmat', True),
        'pos': ('model_named', 'geom_pos', False),
        'quat': ('model_named', 'geom_quat', False),
        'size': ('model_named', 'geom_size', False),
        'rgba': ('model_named', 'geom_rgba', False),
        'friction': ('model_named', 'geom_friction', False),
        'margin': ('model_named', 'geom_margin', False),
    },
    'body': {
        'xpos': ('data_named', 'xpos', True),
        'xquat': ('data_named', 'xquat', True),
        'xmat': ('data_named', 'xmat', True),
        'xipos': ('data_named', 'xipos', True),
        'subtree_com': ('data_named', 'subtree_com', True),
        'xfrc_applied': ('data_named', 'xfrc_applied', False),
        'pos': ('model_named', 'body_pos', False),
        'quat': ('model_named', 'body_quat', False),
        'mass': ('model_named', 'body_mass', False),
        'inertia': ('model_named', 'body_inertia', False),
    },
    'site': {
        'xpos': ('data_named', 'site_xpos', True),
        'xmat': ('data_named', 'site_xmat', True),
        'pos': ('model_named', 'site_pos', False),
        'quat': ('model_named', 'site_quat', False),
        'size': ('model_named', 'site_size', False),
    },
    'actuator': {
        'ctrl': ('data_named', 'ctrl', False),
        'force': ('data_named', 'actuator_force', True),
        'length': ('data_named', 'actuator_length', True),
        'velocity': ('data_named', 'actuator_velocity', True),
        'gear': ('model_named', 'actuator_gear', False),
        'ctrlrange': ('model_named', 'actuator_ctrlrange', False),
    },
    'tendon': {
        'length': ('data_named', 'ten_length', True),
        'velocity': ('data_named', 'ten_velocity', True),
        'stiffness': ('model_named', 'tendon_stiffness', False),
        'range': ('model_named', 'tendon_range', False),
    },
    'sensor': {
        'sensordata': ('data_named', 'sensordata', True),
    },
}


class Binding:
  """Attribute view over the rows owned by one or more elements."""

  def __init__(self, physics: 'Physics', namespace: str,
               names: Sequence[str]):
    object.__setattr__(self, '_physics', physics)
    object.__setattr__(self, '_namespace', namespace)
    object.__setattr__(self, '_names', list(names))
    object.__setattr__(self, '_single', len(names) == 1)

  def _table(self):
    try:
      return _BIND_ATTRS[self._namespace]
    except KeyError:
      raise AttributeError(
          f'cannot bind namespace {self._namespace!r}') from None

  def __getattr__(self, attr):
    table = self._table()
    if attr not in table:
      raise AttributeError(
          f'{self._namespace} binding has no attribute {attr!r}; '
          f'valid: {sorted(table)}')
    kind, field, needs_fwd = table[attr]
    physics = self._physics
    if needs_fwd and physics._needs_forward():
      physics.forward()
    indexer = self._indexer(kind, field)
    key = self._names[0] if self._single else self._names
    return indexer[key]

  def __setattr__(self, attr, value):
    table = self._table()
    if attr not in table:
      raise AttributeError(
          f'{self._namespace} binding has no attribute {attr!r}')
    kind, field, _ = table[attr]
    indexer = self._indexer(kind, field)
    key = self._names[0] if self._single else self._names
    indexer[key] = value

  def _indexer(self, kind, field):
    physics = self._physics
    named = physics.named
    if kind in ('data_named', 'data_jnt'):
      return getattr(named.data, field)
    if kind == 'data_ragged':
      return getattr(named.data, field)
    if kind in ('model_named', 'model_jnt'):
      return getattr(named.model, field)
    if kind == 'model_dof':
      return getattr(named.model, field)
    raise AssertionError(kind)


class Physics(engine.Physics):
  """engine.Physics constructed from an MJCF object model."""

  @classmethod
  def from_mjcf_model(cls, mjcf_model: element_lib.RootElement
                      ) -> 'Physics':
    xml = mjcf_model.to_xml_string()
    assets = mjcf_model.get_assets()
    physics = cls.from_xml_string(xml, assets=assets)
    physics._mjcf_model = mjcf_model
    return physics

  @property
  def mjcf_model(self):
    return getattr(self, '_mjcf_model', None)

  def _needs_forward(self) -> bool:
    return bool(self._dirty_fields or self._model_dirty)

  def bind(self, obj) -> Binding:
    """Returns a Binding for an element or homogeneous element list."""
    if isinstance(obj, element_lib.Element):
      elements = [obj]
    else:
      elements = list(obj)
      if not elements:
        raise ValueError('cannot bind an empty collection')
    namespace = elements[0].spec['identifier']
    if namespace is None:
      raise ValueError(
          f'element {elements[0].tag!r} is not bindable')
    names = []
    for e in elements:
      if e.spec['identifier'] != namespace:
        raise ValueError('all bound elements must share a namespace')
      name = e.full_identifier
      if name is None:
        raise ValueError(f'element {e!r} has no name')
      names.append(name)
    return Binding(self, namespace, names)
