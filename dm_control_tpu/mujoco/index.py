"""Named indexing over Model/Data arrays.

Behavioural counterpart of reference dm_control/mujoco/index.py:270-603:
`physics.named.data.qpos['hinge']`, `...xmat['torso', 'zz']`, ragged
joint-address axes, and xyz/quat/mat column names — implemented as thin
views over host numpy mirrors of the pytree fields.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from dm_control_tpu.models import constants
from dm_control_tpu.models.types import Model

_COLUMN_NAMES = {
    3: ('x', 'y', 'z'),
    4: ('w', 'x', 'y', 'z'),  # quaternions; rgba handled separately
    9: ('xx', 'xy', 'xz', 'yx', 'yy', 'yz', 'zx', 'zy', 'zz'),
}
_RGBA = ('r', 'g', 'b', 'a')


class Axis:
  """Maps names (or lists/slices) to row indices."""

  def __init__(self, names: Sequence[str],
               spans: Optional[List[Tuple[int, int]]] = None,
               size: Optional[int] = None):
    self._names = list(names)
    if spans is None:
      spans = [(i, i + 1) for i in range(len(self._names))]
    self._spans = spans
    self._size = size if size is not None else (
        spans[-1][1] if spans else 0)
    self._lookup = {n: s for n, s in zip(self._names, spans) if n}

  def convert(self, key):
    if isinstance(key, str):
      lo, hi = self._lookup[key]
      if hi - lo == 1:
        return lo
      return slice(lo, hi)
    if isinstance(key, (list, tuple)) and key and any(
        isinstance(k, str) for k in key):
      # names and positional indices may mix (unnamed elements bind
      # positionally — see mjcf/physics.py bind)
      out = []
      for k in key:
        if isinstance(k, str):
          lo, hi = self._lookup[k]
          out.extend(range(lo, hi))
        else:
          out.append(int(k))
      return np.array(out, dtype=int)
    return key

  def element_rows(self, key):
    """Row index/slice for ELEMENT index `key` (span-aware): for
    ragged axes, element i owns spans[i]; for regular axes this is the
    identity. Used by positional (unnamed-element) bindings."""
    if isinstance(key, (int, np.integer)) and 0 <= key < len(
        self._spans):
      lo, hi = self._spans[key]
      return lo if hi - lo == 1 else slice(lo, hi)
    return key

  @property
  def names(self):
    return self._names


class FieldIndexer:
  """2-axis named view over one array field."""

  def __init__(self, get_fn, set_fn, row_axis: Axis,
               col_names: Optional[Sequence[str]] = None):
    self._get = get_fn
    self._set = set_fn
    self._rows = row_axis
    self._cols = {n: i for i, n in enumerate(col_names or ())}

  def _convert(self, key):
    if isinstance(key, tuple) and len(key) == 2:
      row, col = key
      row = self._rows.convert(row)
      if isinstance(col, str):
        col = self._cols[col]
      elif isinstance(col, (list, tuple)) and col and isinstance(
          col[0], str):
        col = np.array([self._cols[c] for c in col], dtype=int)
      return (row, col)
    return self._rows.convert(key)

  def __getitem__(self, key):
    arr = self._get()
    return arr[self._convert(key)]

  def __setitem__(self, key, value):
    arr = self._get()
    arr[self._convert(key)] = value
    self._set(arr)

  def __len__(self):
    return len(self._rows.names)

  @property
  def axes(self):
    return self._rows


def make_axes(m: Model) -> Dict[str, Axis]:
  """Builds the standard row axes from the model's name tables."""
  names = m.names
  axes = {}
  axes['body'] = Axis(names.names('body'))
  axes['geom'] = Axis(names.names('geom'))
  axes['site'] = Axis(names.names('site'))
  axes['actuator'] = Axis(names.names('actuator'))
  axes['tendon'] = Axis(names.names('tendon'))
  axes['camera'] = Axis(names.names('camera'))
  axes['joint'] = Axis(names.names('joint'))

  # ragged axes: qpos / qvel rows owned by joints
  jnames = names.names('joint')
  qpos_spans, qvel_spans = [], []
  for j in range(m.njnt):
    qa = m.jnt_qposadr[j]
    va = m.jnt_dofadr[j]
    jt = constants.JointType(m.jnt_type[j])
    qpos_spans.append((qa, qa + constants.QPOS_WIDTH[jt]))
    qvel_spans.append((va, va + constants.DOF_WIDTH[jt]))
  axes['qpos'] = Axis(jnames, qpos_spans, size=m.nq)
  axes['qvel'] = Axis(jnames, qvel_spans, size=m.nv)

  # sensordata rows owned by sensors
  snames = names.names('sensor')
  spans = [(m.sensor_adr[i], m.sensor_adr[i] + m.sensor_dim[i])
           for i in range(m.nsensor)]
  axes['sensordata'] = Axis(snames, spans, size=m.nsensordata)
  return axes


# field -> (row axis name, column names)
DATA_FIELDS = {
    'qpos': ('qpos', None),
    'qvel': ('qvel', None),
    'qacc': ('qvel', None),
    'qfrc_applied': ('qvel', None),
    'qfrc_bias': ('qvel', None),
    'qfrc_passive': ('qvel', None),
    'qfrc_actuator': ('qvel', None),
    'qfrc_constraint': ('qvel', None),
    'qfrc_smooth': ('qvel', None),
    'ctrl': ('actuator', None),
    'actuator_force': ('actuator', None),
    'actuator_length': ('actuator', None),
    'actuator_velocity': ('actuator', None),
    'xpos': ('body', _COLUMN_NAMES[3]),
    'xquat': ('body', _COLUMN_NAMES[4]),
    'xipos': ('body', _COLUMN_NAMES[3]),
    'subtree_com': ('body', _COLUMN_NAMES[3]),
    'xfrc_applied': ('body', ('fx', 'fy', 'fz', 'tx', 'ty', 'tz')),
    'geom_xpos': ('geom', _COLUMN_NAMES[3]),
    'site_xpos': ('site', _COLUMN_NAMES[3]),
    'xanchor': ('joint', _COLUMN_NAMES[3]),
    'xaxis': ('joint', _COLUMN_NAMES[3]),
    'sensordata': ('sensordata', None),
    'ten_length': ('tendon', None),
    'ten_velocity': ('tendon', None),
}

# matrix fields get flattened to (n, 9) views with mat column names
DATA_MAT_FIELDS = {
    'xmat': 'body',
    'ximat': 'body',
    'geom_xmat': 'geom',
    'site_xmat': 'site',
}

MODEL_FIELDS = {
    'body_pos': ('body', _COLUMN_NAMES[3]),
    'body_quat': ('body', _COLUMN_NAMES[4]),
    'body_ipos': ('body', _COLUMN_NAMES[3]),
    'body_mass': ('body', None),
    'body_subtreemass': ('body', None),
    'body_inertia': ('body', ('ixx', 'iyy', 'izz')),
    'geom_pos': ('geom', _COLUMN_NAMES[3]),
    'geom_quat': ('geom', _COLUMN_NAMES[4]),
    'geom_size': ('geom', _COLUMN_NAMES[3]),
    'geom_friction': ('geom', ('slide', 'spin', 'roll')),
    'geom_rgba': ('geom', _RGBA),
    'geom_margin': ('geom', None),
    'jnt_range': ('joint', ('min', 'max')),
    'jnt_axis': ('joint', _COLUMN_NAMES[3]),
    'jnt_pos': ('joint', _COLUMN_NAMES[3]),
    'jnt_stiffness': ('joint', None),
    'dof_damping': ('qvel', None),
    'dof_armature': ('qvel', None),
    'actuator_gear': ('actuator', None),
    'actuator_ctrlrange': ('actuator', ('min', 'max')),
    'actuator_forcerange': ('actuator', ('min', 'max')),
    'site_pos': ('site', _COLUMN_NAMES[3]),
    'site_size': ('site', _COLUMN_NAMES[3]),
    'tendon_range': ('tendon', ('min', 'max')),
    'tendon_stiffness': ('tendon', None),
    'tendon_length0': ('tendon', None),
    'cam_pos': ('camera', _COLUMN_NAMES[3]),
    'wrap_prm': (None, None),
}


# ---------------------------------------------------------------------------
# generated field tables
#
# The hand-curated tables above pin down column names and ragged axes
# for the common fields; `build_tables` AUGMENTS them with every other
# array field of Model/Data whose row axis is derivable from its name
# prefix and leading dimension — the TPU equivalent of the reference's
# sizes.array_sizes-generated attribute inventory (reference
# dm_control/mujoco/index.py:94-174, mjcf/physics.py:94-117). Binding
# or named-indexing any schema-known attribute then works without a
# per-attribute allowlist.
# ---------------------------------------------------------------------------

_PREFIX_AXIS = {
    'body_': ('body', 'nbody'),
    'jnt_': ('joint', 'njnt'),
    'dof_': ('qvel', 'nv'),
    'geom_': ('geom', 'ngeom'),
    'site_': ('site', 'nsite'),
    'cam_': ('camera', 'ncam'),
    'tendon_': ('tendon', 'ntendon'),
    'ten_': ('tendon', 'ntendon'),
    'actuator_': ('actuator', 'nu'),
}

# body-axis Data fields have no prefix in mjData naming
_BODY_DATA_FIELDS = ('xpos', 'xquat', 'xipos', 'subtree_com',
                     'subtree_linvel', 'subtree_angmom', 'cvel',
                     'xfrc_applied')


def _axis_of(name: str, leading: int, m: Model):
  """Infer the row axis of an array field, or None."""
  if name in _BODY_DATA_FIELDS:
    return 'body' if leading == m.nbody else None
  if name == 'qpos':
    return 'qpos'
  if name.startswith(('qvel', 'qacc', 'qfrc', 'qM', 'qLD')):
    return 'qvel' if leading == m.nv else None
  if name in ('ctrl',):
    return 'actuator'
  if name == 'sensordata':
    return 'sensordata'
  for prefix, (axis, count) in _PREFIX_AXIS.items():
    if name.startswith(prefix):
      return axis if leading == getattr(m, count) else None
  return None


def build_tables(m: Model, d) -> Tuple[Dict, Dict, Dict]:
  """(model_fields, data_fields, data_mat_fields) for this model,
  covering every inferable array field."""
  import dataclasses
  model_fields = dict(MODEL_FIELDS)
  data_fields = dict(DATA_FIELDS)
  mat_fields = dict(DATA_MAT_FIELDS)

  def scan(obj, fields, mats, skip):
    for f in dataclasses.fields(type(obj)):
      name = f.name
      if name in fields or name in mats or name in skip:
        continue
      if not (f.metadata or {}).get('pytree_node', True):
        continue   # static/meta field
      arr = getattr(obj, name, None)
      if arr is None or not hasattr(arr, 'shape') or not arr.shape:
        continue
      axis = _axis_of(name, arr.shape[0], m)
      if axis is None:
        continue
      if arr.ndim == 3 and arr.shape[1:] == (3, 3):
        mats[name] = axis
      elif arr.ndim <= 2:
        cols = None
        if arr.ndim == 2:
          w = arr.shape[1]
          if name.endswith('range'):
            cols = ('min', 'max')
          elif w in _COLUMN_NAMES:
            cols = _COLUMN_NAMES[w]
        fields[name] = (axis, cols)

  scan(m, model_fields, {}, skip=('qpos0', 'qpos_spring'))
  scan(d, data_fields, mat_fields, skip=())
  model_fields.setdefault('qpos0', ('qpos', None))
  model_fields.setdefault('qpos_spring', ('qpos', None))
  return model_fields, data_fields, mat_fields


class NamedView:
  """`physics.named.data` / `physics.named.model` attribute container."""

  def __init__(self, owner, fields, mat_fields, axes, kind):
    self._owner = owner
    self._fields = fields
    self._mat_fields = mat_fields or {}
    self._axes = axes
    self._kind = kind

  def __getattr__(self, name):
    if name.startswith('_'):
      raise AttributeError(name)
    owner = self._owner
    kind = self._kind
    if name in self._mat_fields:
      axis = self._axes[self._mat_fields[name]]
      get = lambda: owner._get_field(kind, name).reshape(len(axis.names),
                                                         9)
      set_ = lambda arr: owner._set_field(
          kind, name, arr.reshape(-1, 3, 3))
      return FieldIndexer(get, set_, axis, _COLUMN_NAMES[9])
    if name in self._fields:
      axis_name, cols = self._fields[name]
      axis = (self._axes[axis_name] if axis_name else
              Axis([], [], 0))
      get = lambda: owner._get_field(kind, name)
      set_ = lambda arr: owner._set_field(kind, name, arr)
      return FieldIndexer(get, set_, axis, cols)
    raise AttributeError(
        f'no named view for field {name!r}')
