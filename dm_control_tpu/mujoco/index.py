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
    if isinstance(key, (list, tuple)) and key and isinstance(
        key[0], str):
      out = []
      for k in key:
        lo, hi = self._lookup[k]
        out.extend(range(lo, hi))
      return np.array(out, dtype=int)
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
