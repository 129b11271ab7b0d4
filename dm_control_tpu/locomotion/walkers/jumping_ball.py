"""Jumping/rolling ball-with-head walkers.

Behavioral contract: reference locomotion/walkers/jumping_ball.py —
a steerable ball that rolls (and, in the jumping variant, kicks),
planar slide-joint root, yaw-only set_pose, optional actuated camera
rig with gravity compensation, optional ears/markers. The MJCF model
is the vendored task-spec asset (assets/jumping_ball/).
"""

from __future__ import annotations

import os

import numpy as np

from dm_control_tpu import mjcf
from dm_control_tpu.locomotion.walkers import base

_XML = os.path.join(os.path.dirname(__file__), 'assets', 'jumping_ball',
                    'jumping_ball_with_head.xml')

_EAR_SPECS = (((.22, 0, 0), (.7, 0, 0, 1)),
              ((-.22, 0, 0), (0, 0, .7, 1)))

_CAMERA_RIG = ('camera_height', 'camera_tilt')

_SLIDE_AXES = {'x': (1, 0, 0), 'y': (0, 1, 0), 'z': (0, 0, 1)}


def _quat_yaw(quaternion):
  """Rotation about +z encoded in a wxyz quaternion."""
  w, x, y, z = quaternion
  return np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))


class JumpingBallWithHead(base.Walker):
  """A rollable and jumpable ball with a head."""

  def _build(self, name='walker', marker_rgba=None,
             camera_control=False, initializer=None, add_ears=False,
             camera_height=None):
    self.set_pose_initializers(initializer)
    self._mjcf_root = mjcf.from_path(_XML)
    self._root_joints = None
    self._camera_control = camera_control
    if name:
      self._mjcf_root.model = name
    self._configure_camera_rig(camera_control, camera_height)
    self._decorate(add_ears, marker_rgba)

  def _configure_camera_rig(self, camera_control, camera_height):
    if camera_height is not None:
      self._mjcf_root.find(
          'body', 'egocentric_camera').pos[2] = camera_height
    if not camera_control:
      # fixed camera: drop the height/tilt dofs entirely
      for rig_name in _CAMERA_RIG:
        self._mjcf_root.find('actuator', rig_name).remove()
        self._mjcf_root.find('joint', rig_name).remove()

  def _decorate(self, add_ears, marker_rgba):
    if add_ears:
      head = self._mjcf_root.find('body', 'head_body')
      for pos, rgba in _EAR_SPECS:
        head.add('site', type='sphere', size=(.26,), pos=pos,
                 rgba=rgba)
    if marker_rgba is not None:
      for geom in self.marker_geoms:
        geom.set_attributes(rgba=marker_rgba)

  @property
  def marker_geoms(self):
    return [self._mjcf_root.find('geom', 'head')]

  def create_root_joints(self, attachment_frame):
    """Translation-only x/y/z slide root instead of a freejoint."""
    root_class = self._mjcf_root.find('default', 'root')
    self._root_joints = [
        attachment_frame.add('joint', name=f'root_{axis_name}',
                             type='slide', axis=list(axis),
                             dclass=root_class)
        for axis_name, axis in _SLIDE_AXES.items()]

  def set_pose(self, physics, position=None, quaternion=None):
    if position is not None:
      if self._root_joints is not None:
        physics.bind(self._root_joints).qpos = position
      else:
        super().set_pose(physics, position, quaternion=None)
    physics.bind(self._mjcf_root.find_all('joint')).qpos = 0.
    if quaternion is not None:
      # yaw is the ball's only attitude dof; it lives on the steer
      # joint, not the root
      steer = self._mjcf_root.find('joint', 'steer')
      physics.bind(steer).qpos = _quat_yaw(quaternion)

  def initialize_episode(self, physics, random_state):
    del random_state
    if self._camera_control:
      # hold the camera rig against gravity so its dofs only see the
      # actuators
      rig = physics.bind(
          self._mjcf_root.find('body', 'egocentric_camera'))
      weight = rig.mass[..., None] * np.hstack(
          [physics.model.opt.gravity, np.zeros(3)])
      rig.xfrc_applied = -weight

  mjcf_model = property(lambda self: self._mjcf_root)

  @property
  def actuators(self):
    return self._mjcf_root.find_all('actuator')

  @property
  def root_body(self):
    return self._mjcf_root.find('body', 'head_body')

  @property
  def end_effectors(self):
    return [self._mjcf_root.find('body', 'head_body')]

  @property
  def observable_joints(self):
    return [self._mjcf_root.find('joint', 'kick')]

  @property
  def egocentric_camera(self):
    return self._mjcf_root.find('camera', 'egocentric')

  @property
  def ground_contact_geoms(self):
    return (self._mjcf_root.find('geom', 'shell'),)


class RollingBallWithHead(JumpingBallWithHead):
  """The same ball without the kick degree of freedom."""

  def _build(self, **kwargs):
    super()._build(**kwargs)
    self._mjcf_root.find('actuator', 'kick').remove()
    self._mjcf_root.find('joint', 'kick').remove()

  @property
  def observable_joints(self):
    return []
