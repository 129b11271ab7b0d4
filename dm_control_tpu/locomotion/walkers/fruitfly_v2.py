"""A fruit fly walker.

Behavioral contract: reference locomotion/walkers/fruitfly_v2.py
FruitFly — the anatomically detailed fly model with retractable body
parts (legs/wings/mouth/antennae), per-class action layout (adhesion,
head, mouth, antennae, wings, abdomen, legs, user), actuator filter
dynamics, flight-pose body pitch, and buffered sensor observables.
Restructured: part handling is one declarative table driven by a
single retire pass, and the action layout is computed in one sweep.

The model XML + meshes are the vendored task-spec assets
(assets/fruitfly_v2/, Apache-2.0, The dm_control Authors). The
published asset set is missing `head_red.msh` (the reference snapshot
cannot compile either); that visual-only geom is dropped at load.

Adhesion actuators (claw/labrum suction) compile to BODY-transmission
moment rows: the mean contact-normal Jacobian over the body's active
contacts, pulling into the contact (ops/smooth.py:_adhesion_moments;
oracle parity in tests/test_adhesion.py).
"""

from __future__ import annotations

import collections
import os

import numpy as np
from dm_env import specs

from dm_control_tpu import composer
from dm_control_tpu import mjcf
from dm_control_tpu.composer.observation import observable
from dm_control_tpu.locomotion.walkers import base

_XML_PATH = os.path.join(os.path.dirname(__file__), 'assets',
                         'fruitfly_v2', 'fruitfly.xml')
_SPAWN_POS = np.array((0, 0, 0.1278))

# action classes in ctrl-vector order; name -> actuator-name substrings
_PART_SUBSTRINGS = collections.OrderedDict(
    adhesion=(),
    head=('head',),
    mouth=('rostrum', 'haustellum', 'labrum'),
    antennae=('antenna',),
    wings=('wing',),
    abdomen=('abdomen',),
    legs=('T1', 'T2', 'T3'),
    user=())

# meshes referenced by fruitfly.xml but absent from the published assets
_MISSING_MESHES = ('head_red',)


def _matches(name, substrings):
  return name is not None and any(s in name for s in substrings)


def _retracted_quat(body):
  """Body orientation that folds its joints to their springrefs."""
  quat = np.array([1., 0., 0., 0.])
  if body.quat is not None:
    quat = np.array(body.quat, dtype=float)
  for joint in body.get_children('joint'):
    springref = joint.springref or (joint.dclass.joint.springref
                                    if joint.dclass else None)
    if springref is None or joint.axis is None:
      continue
    axis = np.asarray(joint.axis, dtype=float)
    axis = axis / np.linalg.norm(axis)
    half = float(springref) / 2
    fold = np.concatenate([[np.cos(half)], np.sin(half) * axis])
    w1, v1 = quat[0], quat[1:]
    w2, v2 = fold[0], fold[1:]
    quat = np.concatenate([
        [w1 * w2 - v1 @ v2], w1 * v2 + w2 * v1 + np.cross(v1, v2)])
  return quat


class FruitFly(base.Walker):
  """An anatomically detailed fruit fly walker."""

  def _build(self,
             name: str = 'walker',
             use_legs: bool = True,
             use_wings: bool = False,
             use_mouth: bool = False,
             use_antennae: bool = False,
             joint_filter: float = 0.01,
             adhesion_filter: float = 0.01,
             body_pitch_angle: float = 47.5,
             stroke_plane_angle: float = 0.,
             physics_timestep: float = 1e-4,
             control_timestep: float = 2e-3,
             num_user_actions: int = 0,
             eye_camera_fovy: float = 150.,
             eye_camera_size: int = 32,
             initializer=None):
    self.set_pose_initializers(initializer)
    self._adhesion_filter = adhesion_filter
    self._control_timestep = control_timestep
    self._buffer_size = int(round(control_timestep / physics_timestep))
    self._eye_camera_size = eye_camera_size
    self._weight = 0.0
    root = mjcf.from_path(_XML_PATH)
    self._mjcf_root = root
    if name:
      root.model = name

    for mesh_name in _MISSING_MESHES:
      for namespace in ('geom', 'mesh'):
        element = root.find(namespace, mesh_name)
        if element is not None:
          element.remove()

    root.find('joint', 'free').remove()
    for eye in ('eye_right', 'eye_left'):
      root.find('camera', eye).fovy = eye_camera_fovy

    disabled = [part for part, used in (
        ('legs', use_legs), ('wings', use_wings), ('mouth', use_mouth),
        ('antennae', use_antennae)) if not used]
    for part in disabled:
      self._retire_part(part, retract=(part == 'legs'))

    if use_wings:
      self._set_flight_pose(body_pitch_angle, stroke_plane_angle)

    if joint_filter > 0:
      for actuator in root.find_all('actuator'):
        if actuator.tag != 'adhesion':
          actuator.dyntype = 'filter'
          actuator.dynprm = (joint_filter,)
    if adhesion_filter > 0:
      for actuator in root.find_all('actuator'):
        if actuator.tag == 'adhesion':
          try:
            actuator.dclass.parent.general.dyntype = 'filter'
            actuator.dclass.parent.general.dynprm = (adhesion_filter,)
          except AttributeError:
            pass

    self._layout_actions(num_user_actions)

  # ------------------------------------------------ build helpers

  def _retire_part(self, part, retract=False):
    """Removes a body part's actuators/joints/tendons; optionally
    folds its bodies to the spring-reference (retracted) pose."""
    root = self._mjcf_root
    substrings = _PART_SUBSTRINGS[part]
    if retract:
      for body in root.find_all('body'):
        if _matches(body.name, substrings):
          body.quat = _retracted_quat(body)
    removes_joints = part in ('legs',)
    for tendon in list(root.find_all('tendon')):
      if part == 'legs' and _matches(tendon.name, substrings):
        actuator = root.find('actuator', tendon.name)
        if actuator is not None:
          actuator.remove()
        tendon.remove()
    for joint in list(root.find_all('joint')):
      if _matches(joint.name, substrings):
        actuator = root.find('actuator', joint.name)
        if actuator is not None:
          actuator.remove()
        if removes_joints:
          joint.remove()
    if part in ('legs', 'mouth'):
      for actuator in list(root.find_all('actuator')):
        if (_matches(actuator.name, substrings)
            and 'adhere' in (actuator.name or '')):
          actuator.remove()

  def _set_flight_pose(self, body_pitch_angle, stroke_plane_angle):
    """Pitches the hover frame and rotates the wing-joint frames into
    the requested stroke plane."""
    from dm_control_tpu.utils import transformations as tr
    root = self._mjcf_root
    up_dir = root.find('site', 'hover_up_dir').quat
    delta = np.deg2rad(body_pitch_angle) - 2 * np.arccos(up_dir[0])
    pitch = np.array([np.cos(delta / 2), 0, np.sin(delta / 2), 0])
    up_dir[:] = np.asarray(tr.quat_mul(pitch, np.array(up_dir)))
    half_sp = np.deg2rad(stroke_plane_angle) / 2
    stroke = np.array([np.cos(half_sp), 0, np.sin(half_sp), 0])
    for base_quat, wing in ((np.array([0., 0, 0, 1]), 'wing_left'),
                            (np.array([0., -1, 0, 0]), 'wing_right')):
      dq = np.asarray(tr.quat_mul(tr.quat_conj(stroke), base_quat))
      new_quat = np.asarray(
          tr.quat_mul(dq, tr.quat_conj(np.array(up_dir))))
      body = root.find('body', wing)
      body.quat = new_quat

  def _layout_actions(self, num_user_actions):
    """ctrl indices per action class + the env action segmentation."""
    names = [a.name or '' for a in self._mjcf_root.find_all('actuator')]
    self._ctrl_indices = {}
    for part, substrings in _PART_SUBSTRINGS.items():
      if part == 'adhesion':
        idx = [i for i, n in enumerate(names) if 'adhere' in n]
      elif part == 'user':
        idx = []
      else:
        idx = [i for i, n in enumerate(names)
               if _matches(n, substrings) and 'adhere' not in n]
      self._ctrl_indices[part] = idx or None

    self._num_actions = {
        part: (len(idx) if idx else 0)
        for part, idx in self._ctrl_indices.items()}
    self._num_actions['user'] = num_user_actions

    self._action_indices = {}
    cursor = 0
    for part in _PART_SUBSTRINGS:
      n = self._num_actions[part]
      self._action_indices[part] = list(range(cursor, cursor + n))
      cursor += n

  # ------------------------------------------------ lifecycle

  def initialize_episode(self, physics, random_state):
    del random_state
    mass = float(np.asarray(
        physics.bind(self.thorax).subtreemass))
    self._weight = float(
        np.linalg.norm(np.asarray(physics.model.opt.gravity)) * mass)

  @property
  def upright_pose(self):
    return base.WalkerPose(xpos=_SPAWN_POS)

  weight = property(lambda self: self._weight)
  adhesion_filter = property(lambda self: self._adhesion_filter)
  mjcf_model = property(lambda self: self._mjcf_root)

  # ------------------------------------------------ model views

  @property
  def root_body(self):
    return self._mjcf_root.find('body', 'thorax')

  thorax = root_body

  @property
  def abdomen(self):
    return self._mjcf_root.find('body', 'abdomen')

  @property
  def head(self):
    return self._mjcf_root.find('body', 'head')

  @property
  def head_site(self):
    return self._mjcf_root.find('site', 'head')

  @property
  def observable_joints(self):
    return self._mjcf_root.find_all('joint')

  @property
  def actuators(self):
    return self._mjcf_root.find_all('actuator')

  def _named_or_skip(self, namespace, names):
    out = []
    for n in names:
      element = self._mjcf_root.find(namespace, n)
      if element is not None:
        out.append(element)
    return tuple(out)

  @property
  def mocap_tracking_bodies(self):
    return self._named_or_skip('body', (
        'thorax', 'abdomen', 'head', 'claw_T1_left', 'claw_T1_right',
        'claw_T2_left', 'claw_T2_right', 'claw_T3_left',
        'claw_T3_right'))

  @property
  def end_effectors(self):
    return self._named_or_skip('site', (
        'claw_T1_left', 'claw_T1_right', 'claw_T2_left',
        'claw_T2_right', 'claw_T3_left', 'claw_T3_right'))

  @property
  def appendages(self):
    return self.end_effectors + self._named_or_skip('site', ('head',))

  @property
  def left_eye(self):
    return self._mjcf_root.find('camera', 'eye_left')

  @property
  def right_eye(self):
    return self._mjcf_root.find('camera', 'eye_right')

  @property
  def egocentric_camera(self):
    return self._mjcf_root.find('camera', 'eye_right')

  @property
  def ground_contact_geoms(self):
    return self._named_or_skip('geom', tuple(
        f'tarsal_claw_{seg}_{side}_collision'
        for seg in ('T1', 'T2', 'T3') for side in ('left', 'right')))

  def _build_observables(self):
    return FruitFlyObservables(self, self._buffer_size,
                               self._eye_camera_size)

  # ------------------------------------------------ actions

  def apply_action(self, physics, action, random_state):
    del random_state
    if not self.mjcf_model.find_all('actuator'):
      return
    ctrl = np.zeros(physics.model.nu)
    for part, env_idx in self._action_indices.items():
      ctrl_idx = self._ctrl_indices.get(part)
      if ctrl_idx and env_idx:
        ctrl[ctrl_idx] = np.asarray(action)[env_idx]
    physics.set_control(ctrl)

  def get_action_spec(self, physics):
    ctrl_indices = []
    for part in _PART_SUBSTRINGS:
      if self._ctrl_indices.get(part) and self._num_actions[part]:
        ctrl_indices.extend(self._ctrl_indices[part])
    ranges = np.asarray(
        physics.model.actuator_ctrlrange)[ctrl_indices]
    lo, hi = list(ranges[:, 0]), list(ranges[:, 1])
    names = [(self.actuators[i].name or str(i)) for i in ctrl_indices]
    n_user = self._num_actions['user']
    lo += [-1.0] * n_user
    hi += [1.0] * n_user
    names += [f'user_{i}' for i in range(n_user)]
    return specs.BoundedArray(
        shape=(len(lo),), dtype=float, minimum=np.asarray(lo),
        maximum=np.asarray(hi), name='\t'.join(names))


def _buffered_sensor(kind):
  def getter(self):
    sensors = [s for s in
               self._entity.mjcf_model.find_all('sensor')
               if s.tag == kind]
    return observable.MJCFFeature('sensordata', sensors,
                                  buffer_size=self._buffer_size,
                                  aggregator='mean')
  getter.__name__ = kind
  descriptor = composer.observable(getter)
  descriptor.__set_name__(None, kind)
  return descriptor


class FruitFlyObservables(base.WalkerObservables):
  """Observables for the fruit fly."""

  def __init__(self, walker, buffer_size, eye_camera_size):
    self._buffer_size = buffer_size
    self._eye_camera_size = eye_camera_size
    super().__init__(walker)

  @composer.observable
  def thorax_height(self):
    return observable.MJCFFeature('xpos', self._entity.thorax,
                                  index=2)

  @composer.observable
  def abdomen_height(self):
    return observable.MJCFFeature('xpos', self._entity.abdomen,
                                  index=2)

  @composer.observable
  def world_zaxis_hover(self):
    site = self._entity.mjcf_model.find('site', 'hover_up_dir')
    return observable.MJCFFeature('xmat', site, index=slice(6, 9))

  @composer.observable
  def world_zaxis(self):
    return observable.MJCFFeature('xmat', self._entity.root_body,
                                  index=slice(6, 9))

  @composer.observable
  def world_zaxis_abdomen(self):
    return observable.MJCFFeature('xmat', self._entity.abdomen,
                                  index=slice(6, 9))

  @composer.observable
  def world_zaxis_head(self):
    return observable.MJCFFeature('xmat', self._entity.head,
                                  index=slice(6, 9))

  @composer.observable
  def actuator_activation(self):
    return observable.MJCFFeature(
        'act', self._entity.mjcf_model.find_all('actuator'))

  @composer.observable
  def right_eye(self):
    return observable.MJCFCamera(self._entity.right_eye,
                                 width=self._eye_camera_size,
                                 height=self._eye_camera_size)

  @composer.observable
  def left_eye(self):
    return observable.MJCFCamera(self._entity.left_eye,
                                 width=self._eye_camera_size,
                                 height=self._eye_camera_size)

  @property
  def vestibular(self):
    return [self.gyro, self.accelerometer, self.velocimeter]

  @property
  def proprioception(self):
    return [self.joints_pos, self.joints_vel,
            self.actuator_activation, self.thorax_height,
            self.abdomen_height, self.world_zaxis,
            self.world_zaxis_abdomen, self.world_zaxis_head,
            self.end_effectors_pos]


for _kind in ('force', 'touch', 'accelerometer', 'gyro',
              'velocimeter'):
  setattr(FruitFlyObservables, _kind, _buffered_sensor(_kind))
