"""Motion-capture trajectories as time-major structure-of-arrays.

TPU-first re-design of the reference's proto-backed trajectory wrapper
(reference: dm_control/locomotion/mocap/trajectory.py:44-277).  Instead
of a protobuf with one message per timestep, a clip here is a flat dict
of time-major numpy arrays — the natural layout for `jax.device_put` +
`lax.dynamic_slice` gathers inside a jitted tracking step, and for the
HDF5 on-disk format (datasets are stored (dim, T); we transpose once at
load time).
"""

import copy

import numpy as np

STEP_TIME_TOLERANCE = 1e-4

# Per-walker fields stored flat but logically (T, N, 3) / (T, N, 4).
POSITION_FIELDS_3D = ('end_effectors', 'appendages', 'body_positions')
QUATERNION_FIELDS_4D = ('body_quaternions',)

WALKER_FIELDS = (
    'position', 'quaternion', 'joints', 'center_of_mass', 'end_effectors',
    'appendages', 'body_positions', 'body_quaternions', 'velocity',
    'angular_velocity', 'joints_velocity',
)
PROP_FIELDS = ('position', 'quaternion', 'velocity', 'angular_velocity')
_VELOCITY_FIELDS = ('velocity', 'angular_velocity', 'joints_velocity')

# Walker model enum (mirrors the reference's mocap.proto Walker.Model).
WALKER_MODEL_UNSPECIFIED = 0
WALKER_MODEL_CMU_2019 = 1
WALKER_MODEL_CMU_2020 = 4

# Prop shape enum (mirrors mocap.proto Prop.Shape).
PROP_SHAPE_UNSPECIFIED = 0
PROP_SHAPE_SPHERE = 1
PROP_SHAPE_BOX = 2


class ClipData:
  """One mocap clip: metadata + time-major arrays.

  Attributes:
    identifier: string clip id.
    dt: seconds between timesteps.
    walkers: list of dicts, one per walker, mapping field name ->
      (T, dim) float array.
    props: list of dicts, one per prop, mapping field name -> (T, dim).
    walker_infos: list of metadata dicts (name, model, mass, markers,
      scaling, end_effector_names, appendage_names).
    prop_infos: list of metadata dicts (name, shape, size, mass).
  """

  def __init__(self, identifier='', dt=0.02, walkers=(), props=(),
               walker_infos=(), prop_infos=()):
    self.identifier = identifier
    self.dt = float(dt)
    self.walkers = [dict(w) for w in walkers]
    self.props = [dict(p) for p in props]
    self.walker_infos = [dict(i) for i in walker_infos]
    self.prop_infos = [dict(i) for i in prop_infos]

  @property
  def num_steps(self):
    if self.walkers:
      return len(next(iter(self.walkers[0].values())))
    if self.props:
      return len(next(iter(self.props[0].values())))
    return 0

  def copy(self):
    return ClipData(
        identifier=self.identifier, dt=self.dt,
        walkers=[{k: np.array(v) for k, v in w.items()}
                 for w in self.walkers],
        props=[{k: np.array(v) for k, v in p.items()} for p in self.props],
        walker_infos=copy.deepcopy(self.walker_infos),
        prop_infos=copy.deepcopy(self.prop_infos))


class Trajectory:
  """A windowed view of a `ClipData` with the reference's API surface.

  Mirrors the behaviour of the reference Trajectory (reference
  trajectory.py:44-277): quantized start/end times, optional zeroing of
  the final timestep's velocities, `as_dict()` with 'walker/'-prefixed
  keys, and pose-setting helpers.
  """

  def __init__(self, clip_data, start_time=None, end_time=None,
               start_step=None, end_step=None, zero_out_velocities=True):
    if (start_time and start_step) or (end_time and end_step):
      raise ValueError('Specify either start/end times or start/end steps, '
                       'not both.')
    self._clip = clip_data
    self._zero_out_velocities = zero_out_velocities
    if start_step:
      start_time = start_step * self._clip.dt
    if end_step:
      end_time = end_step * self._clip.dt
    self._set_start_time(start_time or 0.)
    self._set_end_time(
        end_time if end_time is not None
        else self._clip.num_steps * self._clip.dt)
    self._dict = None

  # -- time quantization ---------------------------------------------------

  def _get_quantized_time(self, time):
    if time == float('inf'):
      return self._clip.num_steps - 1
    divided = time / self._clip.dt
    quantized = int(np.round(divided))
    if abs(quantized - divided) > STEP_TIME_TOLERANCE:
      raise ValueError('`time` should be a multiple of dt = {}: got {}'
                       .format(self._clip.dt, time))
    return quantized

  def _get_step_id(self, time):
    quantized = self._get_quantized_time(time)
    return int(np.clip(quantized + self._start_step,
                       self._start_step, self._end_step - 1))

  # -- windows -------------------------------------------------------------

  def _set_start_time(self, new_value):
    self._start_step = int(np.clip(self._get_quantized_time(new_value),
                                   0, self._clip.num_steps - 1))

  def _set_end_time(self, new_value):
    self._end_step = 1 + int(np.clip(self._get_quantized_time(new_value),
                                     0, self._clip.num_steps - 1))

  @property
  def identifier(self):
    return self._clip.identifier

  @property
  def clip_data(self):
    return self._clip

  @property
  def start_time(self):
    return self._start_step * self._clip.dt

  @start_time.setter
  def start_time(self, new_value):
    self._set_start_time(new_value)

  @property
  def end_time(self):
    return (self._end_step - 1) * self._clip.dt

  @end_time.setter
  def end_time(self, new_value):
    self._set_end_time(new_value)

  @property
  def clip_end_time(self):
    return (self._clip.num_steps - 1) * self._clip.dt

  @property
  def start_step(self):
    return self._start_step

  @start_step.setter
  def start_step(self, new_value):
    self._start_step = int(np.clip(int(new_value), 0,
                                   self._clip.num_steps - 1))

  @property
  def end_step(self):
    return self._end_step

  @end_step.setter
  def end_step(self, new_value):
    self._end_step = int(np.clip(int(new_value), 0,
                                 self._clip.num_steps - 1))

  @property
  def duration(self):
    return self.end_time - self.start_time

  @property
  def num_steps(self):
    return self._end_step - self._start_step

  @property
  def dt(self):
    return self._clip.dt

  # -- dict export ---------------------------------------------------------

  def as_dict(self):
    """Returns {key: (T_window, ...) array} with walker/prop prefixes.

    Repeated 3-vector fields are reshaped to (T, N, 3) and quaternion
    stacks to (T, N, 4), matching the reference contract.  The final
    window step has its velocities zeroed when `zero_out_velocities`.
    """
    if self._dict is None:
      full = {}
      n_walkers = len(self._clip.walkers)
      for i, fields in enumerate(self._clip.walkers):
        prefix = 'walker_{:d}/'.format(i) if n_walkers > 1 else 'walker/'
        for name, arr in fields.items():
          arr = np.asarray(arr)
          if name in POSITION_FIELDS_3D:
            arr = arr.reshape(arr.shape[0], -1, 3)
          elif name in QUATERNION_FIELDS_4D:
            arr = arr.reshape(arr.shape[0], -1, 4)
          full[prefix + name] = arr
      n_props = len(self._clip.props)
      for i, fields in enumerate(self._clip.props):
        prefix = 'prop_{:d}/'.format(i) if n_props > 1 else 'prop/'
        for name, arr in fields.items():
          full[prefix + name] = np.asarray(arr)
      for arr in full.values():
        arr.flags.writeable = False
      self._dict = full
    out = {k: np.array(v[self._start_step:self._end_step])
           for k, v in self._dict.items()}
    if self._zero_out_velocities and out:
      for k, v in out.items():
        if k.split('/')[-1] in _VELOCITY_FIELDS and len(v):
          v[-1] = 0.
    return out

  # -- per-timestep access ------------------------------------------------

  def get_timestep_features(self, time):
    """Per-walker/per-prop field dicts at the quantized `time`."""
    step = self._get_step_id(time)
    last = step == self._end_step - 1 and self._zero_out_velocities

    def slice_fields(fields):
      out = {k: np.array(v[step]) for k, v in fields.items()}
      if last:
        for k in _VELOCITY_FIELDS:
          if k in out:
            out[k] = np.zeros_like(out[k])
      return out

    return ([slice_fields(w) for w in self._clip.walkers],
            [slice_fields(p) for p in self._clip.props])

  def get_modified_trajectory(self, clip_modifier, random_state=None):
    modified = self._clip.copy()
    try:
      modifiers = iter(clip_modifier)
    except TypeError:
      modifiers = iter((clip_modifier,))
    for modifier in modifiers:
      try:
        modifier(modified, random_state=random_state)
      except TypeError:
        modifier(modified)
    return type(self)(modified, self.start_time, self.end_time)

  def configure_walkers(self, walkers):
    from dm_control_tpu.locomotion.mocap import walkers as mocap_walkers
    try:
      walkers = iter(walkers)
    except TypeError:
      walkers = iter((walkers,))
    for walker, info in zip(walkers, self._clip.walker_infos):
      winfo = mocap_walkers.WalkerInfo(info)
      winfo.rescale_walker(walker)
      winfo.add_marker_sites(walker)

  def create_props(self, clip_modifier=None, priority_friction=False,
                   prop_factory=None):
    from dm_control_tpu.locomotion.mocap import props as mocap_props
    clip = self._clip
    if clip_modifier is not None:
      clip = clip.copy()
      clip_modifier(clip)
    prop_factory = prop_factory or mocap_props.Prop
    created = []
    for info in clip.prop_infos:
      prop = prop_factory(info, priority_friction=priority_friction)
      if prop is not None:
        created.append(prop)
    return tuple(created)

  def set_walker_poses(self, physics, walkers):
    walker_feats, _ = self.get_timestep_features(physics.time())
    for walker, feats in zip(walkers, walker_feats):
      walker.set_pose(physics, position=feats['position'],
                      quaternion=feats['quaternion'])
      physics.bind(walker.mocap_joints).qpos = feats['joints']

  def set_prop_poses(self, physics, props):
    _, prop_feats = self.get_timestep_features(physics.time())
    for prop, feats in zip(props, prop_feats):
      prop.set_pose(physics, position=feats['position'],
                    quaternion=feats['quaternion'])
