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


# The bind table is GENERATED from the model's named-field inventory
# (index.build_tables) rather than a hand-maintained allowlist — the
# behavioural counterpart of the reference's sizes.array_sizes-derived
# _ATTRIBUTES tables (reference dm_control/mjcf/physics.py:94-117).
# Any attribute the named index layer knows is bindable.

_STATE_DATA_FIELDS = frozenset((
    'qpos', 'qvel', 'act', 'ctrl', 'qfrc_applied', 'xfrc_applied',
    'mocap_pos', 'mocap_quat', 'time'))

_NS_OF_AXIS = {
    'body': 'body', 'joint': 'joint', 'qvel': 'joint', 'qpos': 'joint',
    'geom': 'geom', 'site': 'site', 'camera': 'camera',
    'tendon': 'tendon', 'actuator': 'actuator', 'sensordata': 'sensor',
}

_STRIP_PREFIXES = ('body_', 'jnt_', 'dof_', 'geom_', 'site_', 'cam_',
                   'tendon_', 'ten_', 'actuator_')


def _attr_name(field: str) -> str:
  for p in _STRIP_PREFIXES:
    if field.startswith(p):
      return field[len(p):]
  return field


def _generate_bind_table(named):
  table = {}
  for field, (axis, _cols) in named.model_fields.items():
    ns = _NS_OF_AXIS.get(axis)
    if ns is None:
      continue
    table.setdefault(ns, {})[_attr_name(field)] = ('model', field,
                                                   False)
  for field, (axis, _cols) in named.data_fields.items():
    ns = _NS_OF_AXIS.get(axis)
    if ns is None:
      continue
    needs_fwd = field not in _STATE_DATA_FIELDS
    table.setdefault(ns, {})[_attr_name(field)] = ('data', field,
                                                   needs_fwd)
  for field, axis in named.data_mat_fields.items():
    ns = _NS_OF_AXIS.get(axis)
    if ns is None:
      continue
    table.setdefault(ns, {})[_attr_name(field)] = ('data', field, True)
  return table


_WORLDBODY_NS = ('joint', 'geom', 'site', 'body', 'camera', 'light')


def _doc_order_elements(root, namespace):
  """All elements of a namespace in COMPILE order.

  Worldbody namespaces interleave attached models at their attachment
  frames (the serializer mounts each attachment's worldbody inside its
  frame body, so that is where its joints/geoms land in the compiled
  model); section namespaces (actuators, tendons, ...) append per
  attachment after the host's own, matching the section splicing.
  """
  out = []
  frame_map = {id(frame): sub for frame, sub, _ in root._attachments}

  def walk(e):
    for c in e._children:
      if c.tag == 'default':
        continue   # class templates, not model elements
      if c.spec['identifier'] == namespace:
        out.append(c)
      walk(c)
      if namespace in _WORLDBODY_NS and id(c) in frame_map:
        out.extend(_doc_order_elements(frame_map[id(c)], namespace))

  walk(root)
  if namespace not in _WORLDBODY_NS:
    for _frame, sub, _prefix in root._attachments:
      out.extend(_doc_order_elements(sub, namespace))
  return out


class Binding:
  """Attribute view over the rows owned by one or more elements."""

  def __init__(self, physics: 'Physics', namespace: str,
               names: Sequence[str]):
    object.__setattr__(self, '_physics', physics)
    object.__setattr__(self, '_namespace', namespace)
    object.__setattr__(self, '_names', list(names))
    object.__setattr__(self, '_single', len(names) == 1)

  def _table(self):
    physics = self._physics
    cache = getattr(physics, '_bind_table_cache', None)
    if cache is None:
      cache = _generate_bind_table(physics.named)
      physics._bind_table_cache = cache
    try:
      return cache[self._namespace]
    except KeyError:
      raise AttributeError(
          f'cannot bind namespace {self._namespace!r}') from None

  def __getattr__(self, attr):
    table = self._table()
    if attr == 'act' and self._namespace == 'actuator':
      return self._actuator_act()
    if attr not in table:
      raise AttributeError(
          f'{self._namespace} binding has no attribute {attr!r}; '
          f'valid: {sorted(table)}')
    kind, field, needs_fwd = table[attr]
    physics = self._physics
    if needs_fwd and physics._needs_forward():
      physics.forward()
    indexer = self._indexer(kind, field)
    return indexer[self._key(indexer)]

  def __setattr__(self, attr, value):
    table = self._table()
    if attr not in table:
      raise AttributeError(
          f'{self._namespace} binding has no attribute {attr!r}')
    kind, field, _ = table[attr]
    indexer = self._indexer(kind, field)
    indexer[self._key(indexer)] = value

  def _actuator_act(self):
    """Per-actuator activation state (data.act is indexed by the
    ragged activation axis, not the actuator axis, so the generated
    table cannot cover it — reference core.py exposes it the same
    way)."""
    import numpy as np
    physics = self._physics
    model = physics.model
    act = np.asarray(physics.data.act)
    adr = np.asarray(model.actuator_actadr)
    num = np.asarray(model.actuator_actnum)
    values = []
    for name in self._names:
      i = (model.names.name2id('actuator', name)
           if isinstance(name, str) else name)
      if adr[i] < 0 or num[i] == 0:
        values.append(0.0)
      else:
        values.append(float(act[adr[i] + num[i] - 1]))
    return values[0] if self._single else np.asarray(values)

  def _indexer(self, kind, field):
    named = self._physics.named
    return getattr(named.data if kind == 'data' else named.model, field)

  def _key(self, indexer):
    """Index key for this binding: names pass through; positional
    (unnamed-element) indices map through the axis spans so ragged
    fields (e.g. a freejoint's 7 qpos rows) resolve correctly."""
    axis = indexer.axes
    if self._single:
      k = self._names[0]
      return k if isinstance(k, str) else axis.element_rows(k)
    out = []
    for k in self._names:
      if isinstance(k, str):
        out.append(k)
        continue
      rows = axis.element_rows(k)
      if isinstance(rows, slice):
        out.extend(range(rows.start, rows.stop))
      else:
        out.append(rows)
    return out


class Physics(engine.Physics):
  """engine.Physics constructed from an MJCF object model."""

  @classmethod
  def from_mjcf_model(cls, mjcf_model: element_lib.RootElement
                      ) -> 'Physics':
    xml = mjcf_model.to_xml_string()
    assets = mjcf_model.get_assets()
    # composer scenes commonly contain robot meshes that
    # interpenetrate by design (Jaco links): give the top-K contact
    # compaction a wide envelope so prop/ground contacts are never
    # starved out by deep robot self-contacts
    physics = cls.from_xml_string(xml, assets=assets, contact_budget=64)
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
    all_in_ns = None
    for e in elements:
      if e.spec['identifier'] != namespace:
        raise ValueError('all bound elements must share a namespace')
      name = e.full_identifier
      if name is None:
        # unnamed elements bind positionally by compile order — the
        # behavioural counterpart of the reference's element_id-based
        # binding (reference mjcf/physics.py:276-296)
        if all_in_ns is None:
          root = self._mjcf_model.root if hasattr(
              self._mjcf_model, 'root') else self._mjcf_model
          all_in_ns = _doc_order_elements(root, namespace)
        try:
          name = all_in_ns.index(e)
        except ValueError:
          raise ValueError(
              f'element {e!r} has no name and is not reachable from '
              'the compiled model root') from None
      names.append(name)
    return Binding(self, namespace, names)
