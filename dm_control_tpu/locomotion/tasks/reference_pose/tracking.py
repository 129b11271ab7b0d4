"""Multi-clip motion-capture tracking tasks.

Behavioural counterpart of the reference tracking tasks
(dm_control/locomotion/tasks/reference_pose/tracking.py:99-1007):
`ReferencePosesTask` holds a windowed set of reference clips as
time-major arrays, exposes the reference observations (future-frame
deltas against the walker's current features), computes the CoMic-style
rewards, and truncates when the tracking error exceeds a threshold.

The clip features live as (T, ...) numpy arrays (see mocap/trajectory
.py) so per-step reference lookups are O(1) slices; the physics inner
loop underneath remains the jitted TPU step.
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
from dm_control_tpu.locomotion.tasks.reference_pose import types
from dm_control_tpu.locomotion.tasks.reference_pose import utils
from dm_control_tpu.utils import transformations as tr

DEFAULT_PHYSICS_TIMESTEP = 0.005
_MAX_END_STEP = 10 ** 10


def _strip_reference_prefix(dictionary, prefix, keep_prefixes=()):
  """Strips `prefix` from keys; drops other prefixed keys except those
  starting with one of `keep_prefixes`."""
  out = {}
  for key, value in dictionary.items():
    if key.startswith(prefix):
      out[key[len(prefix):]] = value
    elif any(key.startswith(keep) for keep in keep_prefixes):
      out[key] = value
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
    self._min_steps = min_steps
    self._always_init_at_clip_start = always_init_at_clip_start
    self._ghost_offset = ghost_offset
    self._body_error_multiplier = body_error_multiplier
    self._actuator_force_coeff = actuator_force_coeff
    self._loader_class = loader_class

    if isinstance(dataset, str):
      dataset = datasets.DATASETS[dataset]
    self._load_reference_data(
        ref_path=ref_path, clip_modifier=proto_modifier, dataset=dataset)
    self._get_possible_starts()

    self._current_clip_index = 0
    self._current_clip = self._loader.get_trajectory(
        self._dataset.ids[0], zero_out_velocities=False)

    self._arena = arena
    self._walker = utils.add_walker(walker, self._arena)
    self.set_timesteps(physics_timestep=physics_timestep,
                       control_timestep=self._current_clip.dt)

    walker_bodies = self._walker.mocap_tracking_bodies
    walker_bodies_names = [bdy.name for bdy in walker_bodies]
    self._body_idxs = np.array(
        [walker_bodies_names.index(bdy) for bdy in walker_bodies_names])

    self._prop_factory = prop_factory
    self._disable_props = disable_props
    if disable_props:
      self._props = []
    else:
      self._props = self._current_clip.create_props(
          prop_factory=self._prop_factory)
    for prop in self._props:
      self._arena.add_free_entity(prop)

    self._add_observables(enabled_reference_observables)

    self._time_step = 0
    self._current_start_time = 0.0
    self._last_step = 0
    self._reference_observations = dict()
    self._end_mocap = False
    self._should_truncate = False

    self._prop_prefixes = []
    if not disable_props:
      if len(self._props) == 1:
        self._prop_prefixes += ['prop/']
      else:
        self._prop_prefixes += [
            'prop_{:d}/'.format(i) for i in range(len(self._props))]
    self._clip_reference_features = self._current_clip.as_dict()
    self._strip_reference_prefix()

    self._walker_joints = self._clip_reference_features['joints'][0]
    self._walker_features = {
        k: v[0] for k, v in self._clip_reference_features.items()}
    self._walker_features_prev = dict(self._walker_features)
    self._current_reference_features = dict()
    self._reference_ego_bodies_quats = collections.defaultdict(dict)

    if self._ghost_offset is not None:
      self._ghost = utils.add_walker(
          walker, self._arena, name='ghost', ghost=True)
      self._ghost.observables.disable_all()
      if disable_props:
        self._ghost_props = []
      else:
        self._ghost_props = self._current_clip.create_props(
            prop_factory=self._ghost_prop_factory)
        for prop in self._ghost_props:
          self._arena.add_free_entity(prop)
          prop.observables.disable_all()
    else:
      self._ghost_props = []

    self._reset_reward_channels()

  # -- setup helpers --------------------------------------------------------

  def _strip_reference_prefix(self):
    self._clip_reference_features = _strip_reference_prefix(
        self._clip_reference_features, 'walker/',
        keep_prefixes=self._prop_prefixes)
    positions, quaternions = [], []
    for prefix in self._prop_prefixes:
      positions.append(self._clip_reference_features.pop(
          prefix + 'position'))
      quaternions.append(self._clip_reference_features.pop(
          prefix + 'quaternion'))
    if self._prop_prefixes:
      # stored (props, T, d); observation convention is (T, props, d)
      self._clip_reference_features['prop_positions'] = np.transpose(
          positions, axes=[1, 0, 2])
      self._clip_reference_features['prop_quaternions'] = np.transpose(
          quaternions, axes=[1, 0, 2])

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

  def _load_reference_data(self, ref_path, clip_modifier, dataset):
    self._loader = self._loader_class(
        ref_path, clip_modifier=clip_modifier or ())
    self._dataset = dataset
    self._num_clips = len(self._dataset.ids)
    if self._dataset.end_steps is None:
      self._all_clips = [
          self._loader.get_trajectory(clip_id, start_step=start,
                                      end_step=_MAX_END_STEP)
          for clip_id, start in zip(self._dataset.ids,
                                    self._dataset.start_steps)]
      self._dataset.end_steps = tuple(
          clip.end_step for clip in self._all_clips)
    else:
      self._all_clips = [None] * self._num_clips

  def _add_observables(self, enabled_reference_observables):
    ref_keys = (
        'reference_rel_joints', 'reference_rel_bodies_pos_global',
        'reference_rel_bodies_quats', 'reference_rel_bodies_pos_local',
        'reference_ego_bodies_quats', 'reference_rel_root_quat',
        'reference_rel_root_pos_local')
    for key in ref_keys:
      full = 'walker/' + key
      self._walker.observables.add_observable(
          key, base_observable.Generic(
              lambda _, k=full: self._reference_observations[k]),
          enabled=True)
    self._walker.observables.add_observable(
        'reference_appendages_pos',
        base_observable.Generic(self.get_reference_appendages_pos),
        enabled=True)

    if enabled_reference_observables:
      for name, obs in self.observables.items():
        obs.enabled = name in enabled_reference_observables

    self._walker.observables.add_observable(
        'clip_id', base_observable.Generic(self.get_clip_id), enabled=True)
    self._walker.observables.add_observable(
        'velocimeter_control',
        base_observable.Generic(self.get_veloc_control), enabled=True)
    self._walker.observables.add_observable(
        'gyro_control',
        base_observable.Generic(self.get_gyro_control), enabled=True)
    self._walker.observables.add_observable(
        'joints_vel_control',
        base_observable.Generic(self.get_joints_vel_control), enabled=True)

    self._arena.observables.add_observable(
        'reference_props_pos_global',
        base_observable.Generic(self.get_reference_props_pos_global),
        enabled=bool(self._prop_factory))
    self._arena.observables.add_observable(
        'reference_props_quat_global',
        base_observable.Generic(self.get_reference_props_quat_global),
        enabled=bool(self._prop_factory))

    observables = []
    observables += self._walker.observables.proprioception
    observables += self._walker.observables.kinematic_sensors
    observables += self._walker.observables.dynamic_sensors
    for obs in observables:
      obs.enabled = True
    for prop in self._props:
      prop.observables.position.enabled = True
      prop.observables.orientation.enabled = True

  def _get_possible_starts(self):
    self._possible_starts = []
    self._start_probabilities = []
    dataset = self._dataset
    for clip_number, (start, end, weight) in enumerate(
        zip(dataset.start_steps, dataset.end_steps, dataset.weights)):
      last_possible_start = end - self._max_ref_step - self._min_steps
      if self._always_init_at_clip_start:
        self._possible_starts += [(clip_number, start)]
        self._start_probabilities += [weight]
      else:
        self._possible_starts += [
            (clip_number, j) for j in range(start, last_possible_start)]
        self._start_probabilities += [
            weight for _ in range(start, last_possible_start)]
    if not self._possible_starts:
      raise ValueError(
          'No possible starts: clips are too short for the requested '
          'ref_steps/min_steps.')
    self._start_probabilities = (
        np.array(self._start_probabilities, dtype=float)
        / np.sum(self._start_probabilities))

  # -- composer lifecycle ----------------------------------------------------

  def initialize_episode_mjcf(self, random_state):
    if hasattr(self._arena, 'regenerate'):
      self._arena.regenerate(random_state)
    self._get_clip_to_track(random_state)
    for prop in self._props:
      prop.detach()
    if not self._disable_props:
      self._props = self._current_clip.create_props(
          prop_factory=self._prop_factory)
      for prop in self._props:
        self._arena.add_free_entity(prop)
        prop.observables.position.enabled = True
        prop.observables.orientation.enabled = True
      if self._ghost_offset is not None:
        for prop in self._ghost_props:
          prop.detach()
        self._ghost_props = self._current_clip.create_props(
            prop_factory=self._ghost_prop_factory)
        for prop in self._ghost_props:
          self._arena.add_free_entity(prop)
          prop.observables.disable_all()

  def _get_clip_to_track(self, random_state):
    index = random_state.choice(
        len(self._possible_starts), p=self._start_probabilities)
    clip_index, start_step = self._possible_starts[index]

    self._current_clip_index = clip_index
    clip_id = self._dataset.ids[clip_index]
    if self._all_clips[clip_index] is None:
      self._all_clips[clip_index] = self._loader.get_trajectory(
          clip_id,
          start_step=self._dataset.start_steps[clip_index],
          end_step=self._dataset.end_steps[clip_index],
          zero_out_velocities=False)
    self._current_clip = self._all_clips[clip_index]
    self._clip_reference_features = self._current_clip.as_dict()
    self._strip_reference_prefix()

    clip_start = self._dataset.start_steps[clip_index]
    self._time_step = start_step - clip_start
    self._current_start_time = (start_step - clip_start) * (
        self._current_clip.dt)
    self._last_step = (
        len(self._clip_reference_features['joints'])
        - self._max_ref_step - 1)

  def initialize_episode(self, physics, random_state):
    self._set_walker(physics)
    self._walker_features = utils.get_features(
        physics, self._walker, props=self._props)
    self._walker_features_prev = self._walker_features.copy()
    self._walker_joints = np.array(
        physics.bind(self._walker.mocap_joints).qpos)

    self._compute_termination_error()
    if self._termination_error > 1e-2:
      raise ValueError(
          'The termination error exceeds 1e-2 at initialization — '
          'likely a clip/walker mismatch.')

    self._update_ghost(physics)
    self._reference_observations.update(
        self.get_all_reference_observations(physics))
    self._reset_reward_channels()

  def _reset_reward_channels(self):
    if self._reward_keys:
      self.last_reward_channels = collections.OrderedDict(
          [(k, 0.0) for k in self._reward_keys])
    else:
      self.last_reward_channels = None

  def _compute_termination_error(self):
    target_joints = self._clip_reference_features['joints'][self._time_step]
    error_joints = np.mean(np.abs(target_joints - self._walker_joints))
    target_bodies = self._clip_reference_features['body_positions'][
        self._time_step]
    error_bodies = np.mean(np.abs(
        (target_bodies
         - self._walker_features['body_positions'])[self._body_idxs]))
    self._termination_error = (
        0.5 * self._body_error_multiplier * error_bodies
        + 0.5 * error_joints)
    if self._props:
      target_props = self._clip_reference_features['prop_positions'][
          self._time_step]
      cur_props = self._walker_features['prop_positions']
      self._prop_termination_error = np.mean(
          np.linalg.norm(target_props - cur_props, axis=-1))

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

  # -- reference observations -------------------------------------------------

  def get_reference_rel_joints(self, physics):
    del physics
    time_steps = self._time_step + self._ref_steps
    diff = (self._clip_reference_features['joints'][time_steps]
            - self._walker_joints)
    return diff[:, self._walker.mocap_to_observable_joint_order].flatten()

  def get_reference_rel_bodies_pos_global(self, physics):
    del physics
    time_steps = self._time_step + self._ref_steps
    return (self._clip_reference_features['body_positions'][time_steps]
            - self._walker_features['body_positions'])[
                :, self._body_idxs].flatten()

  def get_reference_rel_bodies_quats(self, physics):
    del physics
    time_steps = self._time_step + self._ref_steps
    # vectorised quat_diff over (ref_steps, bodies, 4)
    cur = self._walker_features['body_quaternions'][self._body_idxs]
    ref = self._clip_reference_features['body_quaternions'][
        time_steps][:, self._body_idxs]
    out = np.empty(ref.shape)
    for i in range(ref.shape[0]):
      for j in range(ref.shape[1]):
        out[i, j] = tr.quat_diff(cur[j], ref[i, j])
    return out.flatten()

  def get_reference_rel_bodies_pos_local(self, physics):
    time_steps = self._time_step + self._ref_steps
    obs = self._walker.transform_vec_to_egocentric_frame(
        physics,
        (self._clip_reference_features['body_positions'][time_steps]
         - self._walker_features['body_positions'])[:, self._body_idxs])
    return np.concatenate([np.asarray(o).flatten() for o in obs])

  def get_reference_ego_bodies_quats(self, unused_physics):
    time_steps = self._time_step + self._ref_steps
    quats_for_clip = self._reference_ego_bodies_quats[
        self._current_clip_index]
    obs = []
    for t in time_steps:
      if t not in quats_for_clip:
        root_quat = self._clip_reference_features['quaternion'][t]
        quats_for_clip[t] = [
            tr.quat_diff(
                root_quat,
                self._clip_reference_features['body_quaternions'][t, b])
            for b in self._body_idxs]
      obs.extend(quats_for_clip[t])
    return np.concatenate([np.asarray(o).flatten() for o in obs])

  def get_reference_rel_root_quat(self, physics):
    del physics
    time_steps = self._time_step + self._ref_steps
    obs = [tr.quat_diff(self._walker_features['quaternion'],
                        self._clip_reference_features['quaternion'][t])
           for t in time_steps]
    return np.concatenate([np.asarray(o).flatten() for o in obs])

  def get_reference_appendages_pos(self, physics):
    del physics
    time_steps = self._time_step + self._ref_steps
    return self._clip_reference_features['appendages'][
        time_steps].flatten()

  def get_reference_rel_root_pos_local(self, physics):
    time_steps = self._time_step + self._ref_steps
    obs = self._walker.transform_vec_to_egocentric_frame(
        physics, (self._clip_reference_features['position'][time_steps]
                  - self._walker_features['position']))
    return np.concatenate([np.asarray(o).flatten() for o in obs])

  def get_reference_props_pos_global(self, physics):
    del physics
    if not self._props:
      return np.zeros((0,))
    time_steps = self._time_step + self._ref_steps
    return self._clip_reference_features['prop_positions'][
        time_steps].flatten()

  def get_reference_props_quat_global(self, physics):
    del physics
    if not self._props:
      return np.zeros((0,))
    time_steps = self._time_step + self._ref_steps
    return self._clip_reference_features['prop_quaternions'][
        time_steps].flatten()

  def get_veloc_control(self, physics):
    """Finite-difference root velocity in the previous root frame."""
    del physics
    rmat_prev = np.asarray(tr.quat_to_mat(
        self._walker_features_prev['quaternion']))[:3, :3]
    veloc_world = (
        self._walker_features['position']
        - self._walker_features_prev['position']) / self._control_timestep
    return np.dot(veloc_world, rmat_prev)

  def get_gyro_control(self, physics):
    del physics
    quat_curr = self._walker_features['quaternion']
    quat_prev = self._walker_features_prev['quaternion']
    normed_diff = np.asarray(tr.quat_diff(quat_prev, quat_curr))
    normed_diff = normed_diff / np.linalg.norm(normed_diff)
    return tr.quat_to_axisangle(normed_diff) / self._control_timestep

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
    obs = dict()
    obs['walker/reference_rel_bodies_pos_local'] = (
        self.get_reference_rel_bodies_pos_local(physics))
    obs['walker/reference_rel_joints'] = (
        self.get_reference_rel_joints(physics))
    obs['walker/reference_rel_bodies_pos_global'] = (
        self.get_reference_rel_bodies_pos_global(physics))
    obs['walker/reference_ego_bodies_quats'] = (
        self.get_reference_ego_bodies_quats(physics))
    obs['walker/reference_rel_root_quat'] = (
        self.get_reference_rel_root_quat(physics))
    obs['walker/reference_rel_bodies_quats'] = (
        self.get_reference_rel_bodies_quats(physics))
    obs['walker/reference_rel_root_pos_local'] = (
        self.get_reference_rel_root_pos_local(physics))
    if self._props:
      obs['props/reference_pos_global'] = (
          self.get_reference_props_pos_global(physics))
      obs['props/reference_quat_global'] = (
          self.get_reference_props_quat_global(physics))
    return obs

  # -- reward ------------------------------------------------------------------

  def get_reward(self, physics):
    reward, unused_debug, reward_channels = self._reward_fn(
        termination_error=self._termination_error,
        termination_error_threshold=self._termination_error_threshold,
        reference_features=self._current_reference_features,
        walker_features=self._walker_features,
        reference_observations=self._reference_observations)

    if 'actuator_force' in self._reward_keys:
      reward_channels['actuator_force'] = (
          -self._actuator_force_coeff
          * np.mean(np.square(self._walker.actuator_force(physics))))

    self._should_truncate = (
        self._termination_error > self._termination_error_threshold)
    if self._props:
      self._should_truncate = self._should_truncate or (
          self._prop_termination_error
          > self._prop_termination_error_threshold)

    self.last_reward_channels = reward_channels
    return float(reward)

  # -- pose setting -------------------------------------------------------------

  def _set_walker(self, physics):
    features = {k: v[self._time_step]
                for k, v in self._clip_reference_features.items()}
    utils.set_walker_from_features(physics, self._walker, features)
    if self._props:
      utils.set_props_from_features(physics, self._props, features)
    physics.forward()

  def _update_ghost(self, physics):
    if self._ghost_offset is not None:
      target = {k: v[self._time_step]
                for k, v in self._clip_reference_features.items()}
      utils.set_walker_from_features(physics, self._ghost, target,
                                     self._ghost_offset)
      if self._ghost_props:
        utils.set_props_from_features(
            physics, self._ghost_props, target,
            z_offset=self._ghost_offset)
      physics.forward()

  def action_spec(self, physics):
    binding = physics.bind(self._walker.actuators)
    ctrl = np.asarray(binding.ctrl)
    minimum, maximum = [], []
    ctrlrange = np.asarray(binding.ctrlrange).reshape(-1, 2)
    # unlimited actuators compile to an empty (0, 0) ctrlrange
    limited = ctrlrange[:, 0] < ctrlrange[:, 1]
    for i in range(len(self._walker.actuators)):
      if limited[i]:
        minimum.append(ctrlrange[i, 0])
        maximum.append(ctrlrange[i, 1])
      else:
        minimum.append(-float('inf'))
        maximum.append(float('inf'))
    return specs.BoundedArray(
        shape=ctrl.shape, dtype=ctrl.dtype,
        minimum=np.asarray(minimum, dtype=ctrl.dtype),
        maximum=np.asarray(maximum, dtype=ctrl.dtype),
        name='\t'.join(a.full_identifier or a.name or 'actuator'
                       for a in self._walker.actuators))

  @property
  @abc.abstractmethod
  def name(self):
    raise NotImplementedError

  @property
  def root_entity(self):
    return self._arena


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

    self._walker_features = utils.get_features(
        physics, self._walker, props=self._props)
    self._walker_joints = np.array(
        physics.bind(self._walker.mocap_joints).qpos)
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

  @property
  def name(self):
    return 'MultiClipMocapTracking'


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

  def _get_clip_to_track(self, random_state):
    self._current_clip_index = (
        (self._current_clip_index + 1) % self._num_clips)
    clip_index = self._current_clip_index
    start_step = self._dataset.start_steps[clip_index]
    clip_id = self._dataset.ids[clip_index]
    if self._all_clips[clip_index] is None:
      self._all_clips[clip_index] = self._loader.get_trajectory(
          clip_id, start_step=start_step,
          end_step=self._dataset.end_steps[clip_index],
          zero_out_velocities=False)
    self._current_clip = self._all_clips[clip_index]
    self._clip_reference_features = self._current_clip.as_dict()
    self._clip_reference_features = _strip_reference_prefix(
        self._clip_reference_features, 'walker/')
    self._time_step = start_step - self._dataset.start_steps[clip_index]
    self._current_start_time = self._time_step * self._current_clip.dt
    self._last_step = (len(self._clip_reference_features['joints'])
                       - self._max_ref_step - 1)

  def _set_walker(self, physics):
    features = {k: v[self._time_step]
                for k, v in self._clip_reference_features.items()}
    utils.set_walker_from_features(physics, self._walker, features)
    physics.forward()

  def after_step(self, physics, random_state):
    super().after_step(physics, random_state)
    self._time_step += 1
    self._set_walker(physics)
    self._end_mocap = self._time_step == self._last_step

  def get_reward(self, physics):
    return 0.0

  @property
  def name(self):
    return 'PlaybackTask'
