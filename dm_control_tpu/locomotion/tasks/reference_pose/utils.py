"""Utilities for reference-pose tasks.

Behavioral contract: reference locomotion/tasks/reference_pose/
utils.py — ghost-walker construction, walker state <-> mocap feature
packing, and the feature-dict extraction consumed by the tracking
rewards. Restructured: ghosting is its own pass, the qpos/qvel packing
is table-driven, and feature extraction builds the dict in one place.
"""

import numpy as np

from dm_control_tpu import mjcf
from dm_control_tpu.utils import transformations as tr

# feature keys concatenated into (qpos, qvel)
_QPOS_KEYS = ('position', 'quaternion', 'joints')
_QVEL_KEYS = ('velocity', 'angular_velocity', 'joints_velocity')


def _ghostify_walker(walker, visible):
  """Strips contacts, actuators and lighting; greys out the body."""
  model = walker.mjcf_model
  light = model.find('light', 'tracking_light')
  if light is not None:
    light.remove()
  for geom in model.find_all('geom'):
    alpha = 0.999
    if geom.rgba is not None:
      alpha = min(alpha, geom.rgba[3])
    geom.set_attributes(contype=0, conaffinity=0,
                        rgba=(0.5, 0.5, 0.5, alpha if visible else 0.0))
  doomed = list(model.find_all('actuator'))
  doomed += [s for s in model.find_all('sensor') if 'actuator' in s.tag]
  for elem in doomed:
    elem.remove()
  skin = model.find('skin', 'skin')
  if skin is not None:
    skin.set_attributes(rgba=(0.5, 0.5, 0.5, 0.999 if visible else 0.))


def add_walker(walker_fn, arena, name='walker', ghost=False,
               visible=True, position=(0, 0, 0)):
  """Creates a walker, optionally as a contactless actuator-free ghost."""
  walker = walker_fn(name=name)
  if ghost:
    _ghostify_walker(walker, visible)
  if tuple(position) == (0, 0, 0):
    walker.create_root_joints(arena.attach(walker))
  else:
    spawn_site = arena.mjcf_model.worldbody.add('site', pos=position)
    walker.create_root_joints(arena.attach(walker, spawn_site))
    spawn_site.remove()
  return walker


def get_qpos_qvel_from_features(features):
  """Packs logged walker features into full (qpos, qvel) vectors."""
  return (np.hstack([features[k] for k in _QPOS_KEYS]),
          np.hstack([features[k] for k in _QVEL_KEYS]))


def set_walker_from_features(physics, walker, features, offset=0):
  qpos, qvel = get_qpos_qvel_from_features(features)
  set_walker(physics, walker, qpos, qvel, offset=offset)


def _null_xyz_and_yaw(qpos):
  """Zeroes the horizontal position and the yaw of the root quat."""
  qpos[:2] = 0.
  euler = tr.quat_to_euler(qpos[3:7], ordering='ZYX')
  euler[0] = 0.
  qpos[3:7] = tr.euler_to_quat(euler, ordering='ZYX')


def set_walker(physics, walker, qpos, qvel, offset=0,
               null_xyz_and_yaw=False, position_shift=None,
               rotation_shift=None):
  """Writes root (freejoint) + mocap-joint state onto the walker."""
  qpos = np.array(qpos, dtype=float)
  if null_xyz_and_yaw:
    _null_xyz_and_yaw(qpos)
  qpos[:3] += offset

  root = physics.bind(_find_freejoint(walker))
  root.qpos = qpos[:7]
  root.qvel = qvel[:6]
  joints = physics.bind(walker.mocap_joints)
  joints.qpos = qpos[7:]
  joints.qvel = qvel[6:]
  if position_shift is not None or rotation_shift is not None:
    walker.shift_pose(physics, position=position_shift,
                      quaternion=rotation_shift, rotate_velocity=True)


def _find_freejoint(walker):
  frame = mjcf.get_attachment_frame(walker.mjcf_model)
  for child in frame.get_children('freejoint'):
    return child
  for child in frame.get_children('joint'):
    if child.type == 'free':
      return child
  raise ValueError('walker attachment frame has no free joint')


def set_props_from_features(physics, props, features, z_offset=0):
  if np.isscalar(z_offset):
    z_offset = np.array([0., 0., z_offset])
  for prop, pos, quat in zip(props, features['prop_positions'],
                             features['prop_quaternions']):
    prop.set_pose(physics, pos + z_offset, quat)


def _observed_points(walker, physics, observable_name):
  """An (N, 3) array from a walker observable, if it exists."""
  obs = getattr(walker.observables, observable_name, None)
  if obs is None:
    return None
  return np.array(obs(physics)[:]).reshape(-1, 3)


def get_features(physics, walker, props=None):
  """Extracts the walker feature dict used by tracking rewards."""
  root_pos, root_quat = walker.get_pose(physics)
  root_vel, root_angvel = walker.get_velocity(physics)
  joints = physics.bind(walker.mocap_joints)
  bodies = physics.bind(walker.mocap_tracking_bodies)
  frame = mjcf.get_attachment_frame(walker.mjcf_model)
  end_effectors = _observed_points(walker, physics, 'end_effectors_pos')
  appendages = _observed_points(walker, physics, 'appendages_pos')

  features = {
      'position': np.array(root_pos),
      'quaternion': np.array(root_quat),
      'joints': np.array(joints.qpos),
      'center_of_mass': np.array(physics.bind(frame).subtree_com),
      'end_effectors': end_effectors,
      'appendages': (end_effectors.copy() if appendages is None
                     else appendages),
      'body_positions': np.array(bodies.xpos),
      'body_quaternions': np.array(bodies.xquat),
      'velocity': np.array(root_vel),
      'angular_velocity': np.array(root_angvel),
      'joints_velocity': np.array(joints.qvel),
  }
  if props:
    poses = [prop.get_pose(physics) for prop in props]
    features['prop_positions'] = np.array([p for p, _ in poses])
    features['prop_quaternions'] = np.array([q for _, q in poses])
  return features
