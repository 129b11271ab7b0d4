"""BoxHead soccer walker: a rollable, steerable, kicking ball-with-head
(behavioural counterpart of reference
dm_control/locomotion/soccer/boxhead.py:153-350; the MJCF model is the
vendored task-spec asset, see assets/README.md).
"""

import os

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu import mjcf
from dm_control_tpu.composer.observation import observable
from dm_control_tpu.locomotion.walkers import base

_ASSETS_PATH = os.path.join(os.path.dirname(__file__), 'assets')
_MAX_WALKER_ID = 10
_INVALID_WALKER_ID = 'walker_id must be in [0-10], got: {}.'


class BoxHeadObservables(base.WalkerObservables):
  """BoxHead observables: low-res camera + camera-joint sin/cos."""

  def __init__(self, entity, camera_resolution=(28, 28)):
    self._camera_resolution = camera_resolution
    super().__init__(entity)

  @composer.observable
  def egocentric_camera(self):
    width, height = self._camera_resolution
    return observable.MJCFCamera(self._entity.egocentric_camera,
                                 width=width, height=height)

  @composer.observable
  def prev_action(self):
    return observable.Generic(
        lambda _: self._entity.prev_action)

  @property
  def proprioception(self):
    proprio = super().proprioception
    if self._entity.observable_camera_joints:
      return proprio + [self.camera_joints_pos, self.camera_joints_vel]
    return proprio

  @composer.observable
  def camera_joints_pos(self):
    joints = self._entity.observable_camera_joints

    def _camera_joints(physics):
      qpos = np.asarray(physics.bind(list(joints)).qpos)
      return np.concatenate([np.sin(qpos), np.cos(qpos)], -1)

    return observable.Generic(_camera_joints)

  @composer.observable
  def camera_joints_vel(self):
    return observable.MJCFFeature(
        'qvel', list(self._entity.observable_camera_joints))


class BoxHead(base.Walker):
  """A rollable and jumpable ball with a head."""

  def _build(self, name='walker', marker_rgba=None, camera_control=False,
             camera_resolution=(28, 28), roll_gear=-60, steer_gear=55,
             walker_id=None, initializer=None):
    del initializer
    self._mjcf_root = mjcf.from_path(
        os.path.join(_ASSETS_PATH, 'boxhead.xml'))
    if name:
      self._mjcf_root.model = name
    if walker_id is not None and not 0 <= walker_id <= _MAX_WALKER_ID:
      raise ValueError(_INVALID_WALKER_ID.format(walker_id))
    self._walker_id = walker_id

    if marker_rgba is not None:
      for geom in self.marker_geoms:
        geom.set_attributes(rgba=marker_rgba)
      # colour the shell too (the reference uses a checker texture)
      shell = self._mjcf_root.find('geom', 'shell')
      shell.rgba = list(marker_rgba[:3]) + [1.]

    self._root_joints = None
    self._camera_control = camera_control
    self._camera_resolution = camera_resolution
    if not camera_control:
      for jname in ('camera_pitch', 'camera_yaw'):
        self._mjcf_root.find('actuator', jname).remove()
        self._mjcf_root.find('joint', jname).remove()
    self._roll_gear = roll_gear
    self._steer_gear = steer_gear
    roll = self._mjcf_root.find('actuator', 'roll')
    roll.gear = [self._roll_gear]
    steer = self._mjcf_root.find('actuator', 'steer')
    steer.gear = [self._steer_gear]

    self._prev_action = np.zeros(len(self.actuators))

  def _build_observables(self):
    return BoxHeadObservables(
        self, camera_resolution=self._camera_resolution)

  @property
  def marker_geoms(self):
    geoms = [self._mjcf_root.find('geom', 'arm_l'),
             self._mjcf_root.find('geom', 'arm_r'),
             self._mjcf_root.find('geom', 'eye_l'),
             self._mjcf_root.find('geom', 'eye_r')]
    if self._walker_id is None:
      geoms.append(self._mjcf_root.find('geom', 'head'))
    return [g for g in geoms if g is not None]

  def create_root_joints(self, attachment_frame):
    # planar roots: x/y/z slides; yaw lives on the model's steer joint.
    # Frame joints live in the PARENT model's namescope, so they carry
    # this walker's attachment prefix to stay unique across players.
    prefix = attachment_frame.name or (self._mjcf_root.model + '/')
    root_x = attachment_frame.add(
        'joint', name=prefix + 'root_x', type='slide', axis=[1, 0, 0])
    root_y = attachment_frame.add(
        'joint', name=prefix + 'root_y', type='slide', axis=[0, 1, 0])
    root_z = attachment_frame.add(
        'joint', name=prefix + 'root_z', type='slide', axis=[0, 0, 1])
    self._root_joints = [root_x, root_y, root_z]

  def set_pose(self, physics, position=None, quaternion=None):
    if position is not None:
      if self._root_joints is not None:
        physics.bind(self._root_joints).qpos = position
      else:
        super().set_pose(physics, position, quaternion=None)
    physics.bind(self._mjcf_root.find_all('joint')).qpos = 0.
    if quaternion is not None:
      # only the z-axis (steer) rotation is realizable
      z_angle = np.arctan2(
          2 * (quaternion[0] * quaternion[3]
               + quaternion[1] * quaternion[2]),
          1 - 2 * (quaternion[2] ** 2 + quaternion[3] ** 2))
      physics.bind(self._mjcf_root.find('joint', 'steer')).qpos = z_angle

  def get_pose(self, physics):
    if self._root_joints is not None:
      pos = np.array(physics.bind(self._root_joints).qpos)
      angle = float(np.asarray(
          physics.bind(self._mjcf_root.find('joint', 'steer')).qpos))
      quat = np.array([np.cos(angle / 2), 0, 0, np.sin(angle / 2)])
      return pos, quat
    return super().get_pose(physics)

  def set_velocity(self, physics, velocity=None, angular_velocity=None):
    if velocity is not None and self._root_joints is not None:
      vel = np.zeros(3)
      vel[:] = velocity
      physics.bind(self._root_joints).qvel = vel
    if angular_velocity is not None:
      steer = self._mjcf_root.find('joint', 'steer')
      if np.isscalar(angular_velocity):
        z_velocity = angular_velocity
      else:
        av = np.zeros(3)
        av[:] = angular_velocity
        z_velocity = av[2]
      physics.bind(steer).qvel = z_velocity

  def get_velocity(self, physics):
    if self._root_joints is not None:
      vel = np.array(physics.bind(self._root_joints).qvel)
      steer = float(np.asarray(
          physics.bind(self._mjcf_root.find('joint', 'steer')).qvel))
      return vel, np.array([0., 0., steer])
    return super().get_velocity(physics)

  def initialize_episode(self, physics, random_state):
    del physics, random_state
    self._prev_action = np.zeros(len(self.actuators))

  def apply_action(self, physics, action, random_state):
    super().apply_action(physics, action, random_state)
    self._prev_action = np.array(action)

  @property
  def prev_action(self):
    return self._prev_action

  @property
  def mjcf_model(self):
    return self._mjcf_root

  @property
  def actuators(self):
    return self._mjcf_root.find_all('actuator')

  @property
  def root_body(self):
    return self._mjcf_root.find('body', 'head_body')

  @property
  def end_effectors(self):
    return (self._mjcf_root.find('body', 'head_body'),)

  @property
  def observable_joints(self):
    return (self._mjcf_root.find('joint', 'kick'),)

  @property
  def observable_camera_joints(self):
    if self._camera_control:
      return (self._mjcf_root.find('joint', 'camera_yaw'),
              self._mjcf_root.find('joint', 'camera_pitch'))
    return ()

  @property
  def egocentric_camera(self):
    return self._mjcf_root.find('camera', 'egocentric')

  @property
  def ground_contact_geoms(self):
    return (self._mjcf_root.find('geom', 'shell'),)
