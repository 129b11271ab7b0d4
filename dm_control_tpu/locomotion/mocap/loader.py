"""Loaders for collections of mocap trajectories.

Re-designed from the reference's proto/SSTable loaders (reference:
dm_control/locomotion/mocap/loader.py:29-246).  Clips here are plain
`ClipData` records (time-major numpy arrays); the HDF5 loader reads the
reference's own on-disk layout — per-clip groups with `walkers/walker_i`
and `props/prop_i` subgroups holding (dim, T) datasets — so existing
dm_control HDF5 datasets load unchanged.
"""

import abc
import collections.abc

import numpy as np

from dm_control_tpu.locomotion.mocap import trajectory as trajectory_lib


class TrajectoryLoader(metaclass=abc.ABCMeta):
  """Base class for helpers that load and decode mocap trajectories."""

  def __init__(self, trajectory_class=trajectory_lib.Trajectory,
               clip_modifier=()):
    self._trajectory_class = trajectory_class
    if not isinstance(clip_modifier, collections.abc.Iterable):
      clip_modifier = () if clip_modifier is None else (clip_modifier,)
    for modifier in clip_modifier:
      if not callable(modifier):
        raise ValueError('{} is not callable'.format(modifier))
    self._clip_modifiers = tuple(clip_modifier)

  @abc.abstractmethod
  def keys(self):
    """The sequence of identifiers for the loaded trajectories."""

  @abc.abstractmethod
  def _get_clip_for_key(self, key):
    """Returns a `ClipData` for the requested key."""

  def get_trajectory(self, key, start_time=None, end_time=None,
                     start_step=None, end_step=None,
                     zero_out_velocities=True):
    clip = self._get_clip_for_key(key)
    for modifier in self._clip_modifiers:
      modifier(clip)
    return self._trajectory_class(
        clip, start_time=start_time, end_time=end_time,
        start_step=start_step, end_step=end_step,
        zero_out_velocities=zero_out_velocities)


def _decode(value):
  if isinstance(value, bytes):
    return value.decode('utf-8')
  return value


class HDF5TrajectoryLoader(TrajectoryLoader):
  """Loads mocap trajectories from the reference's HDF5 layout."""

  def __init__(self, path, trajectory_class=trajectory_lib.Trajectory,
               clip_modifier=(), proto_modifier=None):
    try:
      import h5py  # pylint: disable=g-import-not-at-top
    except ImportError as e:
      raise ImportError('h5py is required for HDF5TrajectoryLoader') from e
    if proto_modifier is not None:  # reference-API alias
      clip_modifier = proto_modifier
    self._h5_file = h5py.File(path, mode='r')
    self._keys = tuple(sorted(self._h5_file.keys()))
    super().__init__(trajectory_class=trajectory_class,
                     clip_modifier=clip_modifier)

  def keys(self):
    return self._keys

  def _read_pose_group(self, group, field_names):
    """Reads a walker/prop subgroup's (dim, T) datasets as (T, dim)."""
    fields = {}
    for name in field_names:
      if name in group:
        fields[name] = np.array(group[name]).T
    return fields

  def _walker_info(self, group):
    attrs = group.attrs
    markers = []
    if 'markers' in group:
      marker_group = group['markers']
      for i in range(len(marker_group)):
        m = marker_group['marker_{:d}'.format(i)].attrs
        markers.append({
            'name': _decode(m.get('name', b'')),
            'parent': _decode(m.get('parent', b'')),
            'position': np.array(m.get('position', ())),
            'quaternion': np.array(m.get('quaternion', ())),
        })
    scaling = []
    if 'scaling' in group:
      scale_group = group['scaling']
      for i in range(len(scale_group)):
        s = scale_group['subtree_{:d}'.format(i)].attrs
        scaling.append({
            'body_name': _decode(s.get('body_name', b'')),
            'parent_length': float(s.get('parent_length', 0.0)),
            'size_factor': float(s.get('size_factor', 0.0)),
        })
    return {
        'name': _decode(attrs.get('name', b'')),
        'model': int(attrs.get('model', 0)),
        'mass': float(attrs.get('mass', 0.0)),
        'end_effector_names': [
            _decode(n) for n in attrs.get('end_effector_names', ())],
        'appendage_names': [
            _decode(n) for n in attrs.get('appendage_names', ())],
        'markers': markers,
        'scaling': scaling,
    }

  def _prop_info(self, group):
    attrs = group.attrs
    return {
        'name': _decode(attrs.get('name', b'')),
        'shape': int(attrs.get('shape', 0)),
        'size': np.array(attrs.get('size', ())),
        'mass': float(attrs.get('mass', 0.0)),
    }

  def _get_clip_for_key(self, key):
    if key not in self._h5_file:
      raise KeyError('clip {!r} not in HDF5 file; available: {}'
                     .format(key, self._keys))
    group = self._h5_file[key]
    walkers, walker_infos = [], []
    if 'walkers' in group:
      wgroup = group['walkers']
      for i in range(len(wgroup)):
        sub = wgroup['walker_{:d}'.format(i)]
        walkers.append(
            self._read_pose_group(sub, trajectory_lib.WALKER_FIELDS))
        walker_infos.append(self._walker_info(sub))
    props, prop_infos = [], []
    if 'props' in group:
      pgroup = group['props']
      for i in range(len(pgroup)):
        sub = pgroup['prop_{:d}'.format(i)]
        props.append(self._read_pose_group(sub, trajectory_lib.PROP_FIELDS))
        prop_infos.append(self._prop_info(sub))
    return trajectory_lib.ClipData(
        identifier=key, dt=float(group.attrs['dt']),
        walkers=walkers, props=props,
        walker_infos=walker_infos, prop_infos=prop_infos)


class DictTrajectoryLoader(TrajectoryLoader):
  """In-memory loader over {key: ClipData} — for tests and synthesis."""

  def __init__(self, clips, trajectory_class=trajectory_lib.Trajectory,
               clip_modifier=()):
    self._clips = dict(clips)
    super().__init__(trajectory_class=trajectory_class,
                     clip_modifier=clip_modifier)

  def keys(self):
    return tuple(sorted(self._clips))

  def _get_clip_for_key(self, key):
    return self._clips[key].copy()
