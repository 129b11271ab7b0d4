"""Multi-clip motion-capture tracking tasks.

Behavioral contract: reference locomotion/tasks/reference_pose/
tracking.py — `ReferencePosesTask` tracks windowed mocap clips,
exposes future-frame reference observations relative to the walker's
current features, pays CoMic-style rewards, and truncates when the
tracking error crosses a threshold; `MultiClipMocapTracking` and
`PlaybackTask` specialize episode flow.

TPU-first restructuring: clip loading/caching and start sampling live
in a `_ClipLibrary` (two-stage weighted sampling over per-clip start
ranges instead of a materialized (clip, start) list — same
distribution, O(num_clips) memory); clip features are (T, ...) numpy
arrays so per-step reference lookups are O(1) slices; the reference
observation suite is generated from one table.
"""

import abc
import collections

import numpy as np
from dm_env import specs

from dm_control_tpu import composer
from dm_control_tpu.composer.observation import observable as base_observable
from dm_control_tpu.locomotion.mocap import loader as mocap_loader
from dm_control_tpu.locomotion.tasks.reference_pose import datasets
from dm_control_tpu.locomotion.tasks.reference_pose import rewards
from dm_control_tpu.locomotion.tasks.reference_pose import utils
from dm_control_tpu.utils import transformations as tr

DEFAULT_PHYSICS_TIMESTEP = 0.005
_MAX_END_STEP = 10 ** 10


def _quat_diff_each(a, b):
  """tr.quat_diff over the leading axis of two (N, 4) stacks."""
  return np.stack([np.asarray(tr.quat_diff(x, y))
                   for x, y in zip(a, b)])


class _ClipLibrary:
  """Owns the trajectory loader, the lazy clip cache, and episode
  start sampling for a ClipCollection."""

  def __init__(self, loader, dataset, max_ref_step, min_steps,
               always_start_at_clip_start):
    self.loader = loader
    self.dataset = dataset
    self._cache = [None] * len(dataset.ids)
    if dataset.end_steps is None:
      # probing lengths requires loading every clip once
      self._cache = [
          loader.get_trajectory(clip_id, start_step=start,
                                end_step=_MAX_END_STEP)
          for clip_id, start in zip(dataset.ids, dataset.start_steps)]
      dataset.end_steps = tuple(c.end_step for c in self._cache)

    # per-clip [start, last_valid_start) ranges for episode inits
    margin = max_ref_step + min_steps
    starts = np.asarray(dataset.start_steps)
    if always_start_at_clip_start:
      counts = np.ones(len(dataset.ids), dtype=int)
    else:
      counts = np.maximum(
          0, np.asarray(dataset.end_steps) - margin - starts)
    mass = counts * np.asarray(dataset.weights, dtype=float)
    if mass.sum() <= 0:
      raise ValueError(
          'No possible starts: clips are too short for the requested '
          'ref_steps/min_steps.')
    self._start_ranges = starts
    self._start_counts = counts
    self._clip_probs = mass / mass.sum()

  def __len__(self):
    return len(self.dataset.ids)

  def clip(self, index):
    """The trajectory for clip `index`, loaded on first use."""
    if self._cache[index] is None:
      self._cache[index] = self.loader.get_trajectory(
          self.dataset.ids[index],
          start_step=self.dataset.start_steps[index],
          end_step=self.dataset.end_steps[index],
          zero_out_velocities=False)
    return self._cache[index]

  def sample_start(self, random_state):
    """(clip_index, start_step), weighted like the reference's
    flattened start list: P(clip, start) proportional to clip weight."""
    index = random_state.choice(len(self._clip_probs),
                                p=self._clip_probs)
    offset = random_state.randint(max(1, self._start_counts[index]))
    return index, int(self._start_ranges[index] + offset)


def _relabel(features, prop_prefixes):
  """Strips the 'walker/' prefix and folds per-prop pose tracks into
  (T, props, d) 'prop_positions'/'prop_quaternions' arrays."""
  out = {}
  for key, value in features.items():
    if key.startswith('walker/'):
      out[key[len('walker/'):]] = value
    elif any(key.startswith(p) for p in prop_prefixes):
      out[key] = value
  if prop_prefixes:
    for field, stacked in (('position', 'prop_positions'),
                           ('quaternion', 'prop_quaternions')):
      tracks = [out.pop(prefix + field) for prefix in prop_prefixes]
      out[stacked] = np.transpose(tracks, axes=[1, 0, 2])
  return out


class ReferencePosesTask(composer.Task, metaclass=abc.ABCMeta):
  """Abstract base class for tasks that track mocap reference data."""

  def __init__(self,
               walker,
               arena,
               ref_path,
               ref_steps,
               dataset,
               termination_error_threshold=0.3,
               prop_termination_error_threshold=0.1,
               min_steps=10,
               reward_type='termination_reward',
               physics_timestep=DEFAULT_PHYSICS_TIMESTEP,
               always_init_at_clip_start=False,
               proto_modifier=None,
               prop_factory=None,
               disable_props=False,
               ghost_offset=None,
               body_error_multiplier=1.0,
               actuator_force_coeff=0.015,
               enabled_reference_observables=None,
               loader_class=mocap_loader.HDF5TrajectoryLoader):
    self._ref_steps = np.sort(ref_steps)
    self._max_ref_step = int(self._ref_steps[-1])
    self._termination_error_threshold = termination_error_threshold
    self._prop_termination_error_threshold = (
        prop_termination_error_threshold)
    self._reward_fn = rewards.get_reward(reward_type)
    self._reward_keys = rewards.get_reward_channels(reward_type)
    self._ghost_offset = ghost_offset
    self._body_error_multiplier = body_error_multiplier
    self._actuator_force_coeff = actuator_force_coeff

    if isinstance(dataset, str):
      dataset = datasets.DATASETS[dataset]
    self._library = _ClipLibrary(
        loader_class(ref_path, clip_modifier=proto_modifier or ()),
        dataset, self._max_ref_step, min_steps,
        always_init_at_clip_start)
    self._current_clip_index = 0
    self._current_clip = self._library.loader.get_trajectory(
        dataset.ids[0], zero_out_velocities=False)

    self._arena = arena
    self._walker = utils.add_walker(walker, arena)
    self.set_timesteps(physics_timestep=physics_timestep,
                       control_timestep=self._current_clip.dt)

    body_names = [b.name for b in self._walker.mocap_tracking_bodies]
    self._body_idxs = np.arange(len(body_names))

    self._prop_factory = prop_factory
    self._disable_props = disable_props
    self._props = ([] if disable_props else
                   self._current_clip.create_props(
                       prop_factory=prop_factory))
    for prop in self._props:
      arena.add_free_entity(prop)

    if disable_props or not self._props:
      self._prop_prefixes = []
    elif len(self._props) == 1:
      self._prop_prefixes = ['prop/']
    else:
      self._prop_prefixes = [f'prop_{i:d}/'
                             for i in range(len(self._props))]

    self._add_observables(enabled_reference_observables)

    self._time_step = 0
    self._current_start_time = 0.0
    self._last_step = 0
    self._reference_observations = {}
    self._end_mocap = False
    self._should_truncate = False

    self._clip_reference_features = _relabel(
        self._current_clip.as_dict(), self._prop_prefixes)
    self._walker_joints = self._clip_reference_features['joints'][0]
    self._walker_features = {
        k: v[0] for k, v in self._clip_reference_features.items()}
    self._walker_features_prev = dict(self._walker_features)
    self._current_reference_features = {}
    self._ego_quat_cache = collections.defaultdict(dict)

    self._ghost = None
    self._ghost_props = []
    if ghost_offset is not None:
      self._ghost = utils.add_walker(walker, arena, name='ghost',
                                     ghost=True)
      self._ghost.observables.disable_all()
      if not disable_props:
        self._ghost_props = self._current_clip.create_props(
            prop_factory=self._ghost_prop_factory)
        for prop in self._ghost_props:
          arena.add_free_entity(prop)
          prop.observables.disable_all()

    self._reset_reward_channels()

  # ------------------------------------------------ setup helpers

  def _ghost_prop_factory(self, prop_info, priority_friction=False):
    if self._prop_factory is None:
      return None
    prop = self._prop_factory(prop_info,
                              priority_friction=priority_friction)
    for geom in prop.mjcf_model.find_all('geom'):
      geom.set_attributes(contype=0, conaffinity=0,
                          rgba=(0.5, 0.5, 0.5, .999))
    prop.observables.disable_all()
    return prop

  # reference observation suite: observable name -> producer method
  # name; each reads the cached self._reference_observations entry
  _REF_OBS = ('reference_rel_joints', 'reference_rel_bodies_pos_global',
              'reference_rel_bodies_quats',
              'reference_rel_bodies_pos_local',
              'reference_ego_bodies_quats', 'reference_rel_root_quat',
              'reference_rel_root_pos_local')

  def _add_observables(self, enabled_reference_observables):
    add = self._walker.observables.add_observable
    for key in self._REF_OBS:
      add(key, base_observable.Generic(
          lambda _, k='walker/' + key: self._reference_observations[k]),
          enabled=True)
    add('reference_appendages_pos',
        base_observable.Generic(self.get_reference_appendages_pos),
        enabled=True)
    if enabled_reference_observables:
      for name, obs in self.observables.items():
        obs.enabled = name in enabled_reference_observables
    add('clip_id', base_observable.Generic(self.get_clip_id),
        enabled=True)
    add('velocimeter_control',
        base_observable.Generic(self.get_veloc_control), enabled=True)
    add('gyro_control', base_observable.Generic(self.get_gyro_control),
        enabled=True)
    add('joints_vel_control',
        base_observable.Generic(self.get_joints_vel_control),
        enabled=True)

    has_props = bool(self._prop_factory)
    self._arena.observables.add_observable(
        'reference_props_pos_global',
        base_observable.Generic(self.get_reference_props_pos_global),
        enabled=has_props)
    self._arena.observables.add_observable(
        'reference_props_quat_global',
        base_observable.Generic(self.get_reference_props_quat_global),
        enabled=has_props)

    for obs in (self._walker.observables.proprioception
                + self._walker.observables.kinematic_sensors
                + self._walker.observables.dynamic_sensors):
      obs.enabled = True
    for prop in self._props:
      prop.observables.position.enabled = True
      prop.observables.orientation.enabled = True

  # ------------------------------------------------ composer lifecycle

  def initialize_episode_mjcf(self, random_state):
    if hasattr(self._arena, 'regenerate'):
      self._arena.regenerate(random_state)
    self._pick_clip(random_state)
    for prop in self._props:
      prop.detach()
    if not self._disable_props:
      self._props = self._current_clip.create_props(
          prop_factory=self._prop_factory)
      for prop in self._props:
        self._arena.add_free_entity(prop)
        prop.observables.position.enabled = True
        prop.observables.orientation.enabled = True
      if self._ghost is not None:
        for prop in self._ghost_props:
          prop.detach()
        self._ghost_props = self._current_clip.create_props(
            prop_factory=self._ghost_prop_factory)
        for prop in self._ghost_props:
          self._arena.add_free_entity(prop)
          prop.observables.disable_all()

  def _install_clip(self, clip_index, start_step):
    """Makes `clip_index` current, positioned at `start_step`."""
    self._current_clip_index = clip_index
    self._current_clip = self._library.clip(clip_index)
    self._clip_reference_features = _relabel(
        self._current_clip.as_dict(), self._prop_prefixes)
    clip_start = self._library.dataset.start_steps[clip_index]
    self._time_step = start_step - clip_start
    self._current_start_time = self._time_step * self._current_clip.dt
    self._last_step = (len(self._clip_reference_features['joints'])
                       - self._max_ref_step - 1)

  def _pick_clip(self, random_state):
    self._install_clip(*self._library.sample_start(random_state))

  def initialize_episode(self, physics, random_state):
    self._set_walker(physics)
    self._refresh_walker_features(physics)
    self._walker_features_prev = self._walker_features.copy()

    self._compute_termination_error()
    if self._termination_error > 1e-2:
      raise ValueError(
          'The termination error exceeds 1e-2 at initialization — '
          'likely a clip/walker mismatch.')

    self._update_ghost(physics)
    self._reference_observations.update(
        self.get_all_reference_observations(physics))
    self._reset_reward_channels()

  def _refresh_walker_features(self, physics):
    self._walker_features = utils.get_features(
        physics, self._walker, props=self._props)
    self._walker_joints = np.array(
        physics.bind(self._walker.mocap_joints).qpos)

  def _reset_reward_channels(self):
    self.last_reward_channels = (
        collections.OrderedDict((k, 0.0) for k in self._reward_keys)
        if self._reward_keys else None)

  def _compute_termination_error(self):
    """Mean |joint err| and |body-position err|, mixed 50/50."""
    ref = self._clip_reference_features
    t = self._time_step
    joint_err = np.mean(np.abs(ref['joints'][t] - self._walker_joints))
    body_err = np.mean(np.abs(
        (ref['body_positions'][t]
         - self._walker_features['body_positions'])[self._body_idxs]))
    self._termination_error = (
        0.5 * self._body_error_multiplier * body_err + 0.5 * joint_err)
    if self._props:
      self._prop_termination_error = np.mean(np.linalg.norm(
          ref['prop_positions'][t]
          - self._walker_features['prop_positions'], axis=-1))

  def before_step(self, physics, action, random_state):
    self._walker.apply_action(physics, action, random_state)

  def after_step(self, physics, random_state):
    del random_state
    self._walker_features_prev = self._walker_features.copy()

  def after_compile(self, physics, random_state):
    if not self._reference_observations:
      self._reference_observations.update(
          self.get_all_reference_observations(physics))

  def should_terminate_episode(self, physics):
    del physics
    return self._should_truncate or self._end_mocap

  def get_discount(self, physics):
    del physics
    return 0.0 if self._should_truncate else 1.0

  # ------------------------------------------------ reference obs

  def _window(self):
    """Clip-time indices of the future reference frames."""
    return self._time_step + self._ref_steps

  def get_reference_rel_joints(self, physics):
    del physics
    diff = (self._clip_reference_features['joints'][self._window()]
            - self._walker_joints)
    return diff[:, self._walker.mocap_to_observable_joint_order].flatten()

  def get_reference_rel_bodies_pos_global(self, physics):
    del physics
    ref = self._clip_reference_features['body_positions'][self._window()]
    return (ref - self._walker_features['body_positions'])[
        :, self._body_idxs].flatten()

  def get_reference_rel_bodies_quats(self, physics):
    del physics
    cur = self._walker_features['body_quaternions'][self._body_idxs]
    ref = self._clip_reference_features['body_quaternions'][
        self._window()][:, self._body_idxs]
    return np.stack([_quat_diff_each(cur, frame)
                     for frame in ref]).flatten()

  def get_reference_rel_bodies_pos_local(self, physics):
    ref = self._clip_reference_features['body_positions'][self._window()]
    local = self._walker.transform_vec_to_egocentric_frame(
        physics,
        (ref - self._walker_features['body_positions'])[
            :, self._body_idxs])
    return np.concatenate([np.asarray(x).flatten() for x in local])

  def get_reference_ego_bodies_quats(self, unused_physics):
    cache = self._ego_quat_cache[self._current_clip_index]
    ref = self._clip_reference_features
    parts = []
    for t in self._window():
      if t not in cache:
        cache[t] = _quat_diff_each(
            np.broadcast_to(ref['quaternion'][t], (len(self._body_idxs), 4)),
            ref['body_quaternions'][t, self._body_idxs])
      parts.append(cache[t])
    return np.concatenate([p.flatten() for p in parts])

  def get_reference_rel_root_quat(self, physics):
    del physics
    cur = self._walker_features['quaternion']
    return np.concatenate([
        np.asarray(tr.quat_diff(
            cur, self._clip_reference_features['quaternion'][t])).flatten()
        for t in self._window()])

  def get_reference_appendages_pos(self, physics):
    del physics
    return self._clip_reference_features['appendages'][
        self._window()].flatten()

  def get_reference_rel_root_pos_local(self, physics):
    ref = self._clip_reference_features['position'][self._window()]
    local = self._walker.transform_vec_to_egocentric_frame(
        physics, ref - self._walker_features['position'])
    return np.concatenate([np.asarray(x).flatten() for x in local])

  def _prop_track(self, key):
    if not self._props:
      return np.zeros((0,))
    return self._clip_reference_features[key][self._window()].flatten()

  def get_reference_props_pos_global(self, physics):
    del physics
    return self._prop_track('prop_positions')

  def get_reference_props_quat_global(self, physics):
    del physics
    return self._prop_track('prop_quaternions')

  def get_veloc_control(self, physics):
    """Finite-difference root velocity in the previous root frame."""
    del physics
    frame_prev = np.asarray(tr.quat_to_mat(
        self._walker_features_prev['quaternion']))[:3, :3]
    world_vel = (self._walker_features['position']
                 - self._walker_features_prev['position']
                 ) / self._control_timestep
    return world_vel.dot(frame_prev)

  def get_gyro_control(self, physics):
    del physics
    spin = np.asarray(tr.quat_diff(
        self._walker_features_prev['quaternion'],
        self._walker_features['quaternion']))
    spin = spin / np.linalg.norm(spin)
    return tr.quat_to_axisangle(spin) / self._control_timestep

  def get_joints_vel_control(self, physics):
    del physics
    diff = (self._walker_features['joints']
            - self._walker_features_prev['joints'])
    return diff[self._walker.mocap_to_observable_joint_order] / (
        self._control_timestep)

  def get_clip_id(self, physics):
    del physics
    return np.array([self._current_clip_index])

  def get_all_reference_observations(self, physics):
    obs = {'walker/' + key: getattr(self, 'get_' + key)(physics)
           for key in self._REF_OBS}
    if self._props:
      obs['props/reference_pos_global'] = (
          self.get_reference_props_pos_global(physics))
      obs['props/reference_quat_global'] = (
          self.get_reference_props_quat_global(physics))
    return obs

  # ------------------------------------------------ reward

  def get_reward(self, physics):
    reward, _, reward_channels = self._reward_fn(
        termination_error=self._termination_error,
        termination_error_threshold=self._termination_error_threshold,
        reference_features=self._current_reference_features,
        walker_features=self._walker_features,
        reference_observations=self._reference_observations)

    if 'actuator_force' in self._reward_keys:
      reward_channels['actuator_force'] = (
          -self._actuator_force_coeff
          * np.mean(np.square(self._walker.actuator_force(physics))))

    over = self._termination_error > self._termination_error_threshold
    if self._props:
      over = over or (self._prop_termination_error
                      > self._prop_termination_error_threshold)
    self._should_truncate = over

    self.last_reward_channels = reward_channels
    return float(reward)

  # ------------------------------------------------ pose setting

  def _frame_at_current_step(self):
    return {k: v[self._time_step]
            for k, v in self._clip_reference_features.items()}

  def _set_walker(self, physics):
    frame = self._frame_at_current_step()
    utils.set_walker_from_features(physics, self._walker, frame)
    if self._props:
      utils.set_props_from_features(physics, self._props, frame)
    physics.forward()

  def _update_ghost(self, physics):
    if self._ghost is None:
      return
    frame = self._frame_at_current_step()
    utils.set_walker_from_features(physics, self._ghost, frame,
                                   self._ghost_offset)
    if self._ghost_props:
      utils.set_props_from_features(physics, self._ghost_props, frame,
                                    z_offset=self._ghost_offset)
    physics.forward()

  def action_spec(self, physics):
    binding = physics.bind(self._walker.actuators)
    ctrl = np.asarray(binding.ctrl)
    ctrlrange = np.asarray(binding.ctrlrange).reshape(-1, 2)
    # unlimited actuators compile to an empty (0, 0) ctrlrange
    limited = ctrlrange[:, 0] < ctrlrange[:, 1]
    lo = np.where(limited, ctrlrange[:, 0], -np.inf).astype(ctrl.dtype)
    hi = np.where(limited, ctrlrange[:, 1], np.inf).astype(ctrl.dtype)
    return specs.BoundedArray(
        shape=ctrl.shape, dtype=ctrl.dtype, minimum=lo, maximum=hi,
        name='\t'.join(a.full_identifier or a.name or 'actuator'
                       for a in self._walker.actuators))

  @property
  @abc.abstractmethod
  def name(self):
    raise NotImplementedError

  root_entity = property(lambda self: self._arena)


class MultiClipMocapTracking(ReferencePosesTask):
  """Multi-clip mocap tracking with future-reference observations."""

  def __init__(self, walker, arena, ref_path, ref_steps, dataset,
               disable_props=True, **kwargs):
    super().__init__(walker=walker, arena=arena, ref_path=ref_path,
                     ref_steps=ref_steps, dataset=dataset,
                     disable_props=disable_props, **kwargs)
    self._walker.observables.add_observable(
        'time_in_clip',
        base_observable.Generic(self.get_normalized_time_in_clip),
        enabled=True)

  def after_step(self, physics, random_state):
    super().after_step(physics, random_state)
    self._time_step += 1
    self._refresh_walker_features(physics)
    self._current_reference_features = {
        k: v[self._time_step].copy()
        for k, v in self._clip_reference_features.items()}
    self._compute_termination_error()
    self._end_mocap = self._time_step == self._last_step
    self._reference_observations.update(
        self.get_all_reference_observations(physics))
    self._update_ghost(physics)

  def get_normalized_time_in_clip(self, physics):
    return np.array([(self._current_start_time + physics.time())
                     / self._current_clip.duration])

  name = property(lambda self: 'MultiClipMocapTracking')


class PlaybackTask(ReferencePosesTask):
  """Cycles through clips, overriding the walker pose every step."""

  def __init__(self, walker, arena, ref_path, dataset,
               proto_modifier=None,
               physics_timestep=DEFAULT_PHYSICS_TIMESTEP, **kwargs):
    super().__init__(walker=walker, arena=arena, ref_path=ref_path,
                     ref_steps=(1,), dataset=dataset,
                     termination_error_threshold=float('inf'),
                     physics_timestep=physics_timestep,
                     always_init_at_clip_start=True,
                     proto_modifier=proto_modifier, **kwargs)
    self._current_clip_index = -1

  def _pick_clip(self, random_state):
    del random_state
    index = (self._current_clip_index + 1) % len(self._library)
    self._install_clip(
        index, self._library.dataset.start_steps[index])

  def _set_walker(self, physics):
    utils.set_walker_from_features(physics, self._walker,
                                   self._frame_at_current_step())
    physics.forward()

  def after_step(self, physics, random_state):
    super().after_step(physics, random_state)
    self._time_step += 1
    self._set_walker(physics)
    self._end_mocap = self._time_step == self._last_step

  def get_reward(self, physics):
    return 0.0

  name = property(lambda self: 'PlaybackTask')
