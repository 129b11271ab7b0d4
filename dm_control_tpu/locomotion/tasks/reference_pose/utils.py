"""Utilities for reference-pose tasks
(behavioural counterpart of reference
dm_control/locomotion/tasks/reference_pose/utils.py:25-170).
"""

import numpy as np

from dm_control_tpu import mjcf
from dm_control_tpu.utils import transformations as tr


def add_walker(walker_fn, arena, name='walker', ghost=False, visible=True,
               position=(0, 0, 0)):
  """Creates a walker, optionally as a contactless actuator-free ghost."""
  walker = walker_fn(name=name)

  if ghost:
    light = walker.mjcf_model.find('light', 'tracking_light')
    if light is not None:
      light.remove()

    for geom in walker.mjcf_model.find_all('geom'):
      alpha = 0.999
      rgba = geom.rgba
      if rgba is not None and rgba[3] < alpha:
        alpha = rgba[3]
      geom.set_attributes(
          contype=0, conaffinity=0,
          rgba=(0.5, 0.5, 0.5, alpha if visible else 0.0))

    model = walker.mjcf_model
    elems = list(model.find_all('actuator'))
    elems += [x for x in model.find_all('sensor') if 'actuator' in x.tag]
    for elem in elems:
      elem.remove()

    skin = walker.mjcf_model.find('skin', 'skin')
    if skin is not None:
      skin.set_attributes(
          rgba=(0.5, 0.5, 0.5, 0.999 if visible else 0.))

  if tuple(position) == (0, 0, 0):
    walker.create_root_joints(arena.attach(walker))
  else:
    spawn_site = arena.mjcf_model.worldbody.add('site', pos=position)
    walker.create_root_joints(arena.attach(walker, spawn_site))
    spawn_site.remove()

  return walker


def get_qpos_qvel_from_features(features):
  """Assembles full qpos/qvel vectors from logged walker features."""
  full_qpos = np.hstack([
      features['position'],
      features['quaternion'],
      features['joints'],
  ])
  full_qvel = np.hstack([
      features['velocity'],
      features['angular_velocity'],
      features['joints_velocity'],
  ])
  return full_qpos, full_qvel


def set_walker_from_features(physics, walker, features, offset=0):
  qpos, qvel = get_qpos_qvel_from_features(features)
  set_walker(physics, walker, qpos, qvel, offset=offset)


def set_walker(physics, walker, qpos, qvel, offset=0, null_xyz_and_yaw=False,
               position_shift=None, rotation_shift=None):
  """Sets the free root and joint state of a walker."""
  qpos = np.array(qpos, dtype=float)
  if null_xyz_and_yaw:
    qpos[:2] = 0.
    euler = tr.quat_to_euler(qpos[3:7], ordering='ZYX')
    euler[0] = 0.
    qpos[3:7] = tr.euler_to_quat(euler, ordering='ZYX')
  qpos[:3] += offset

  freejoint = _find_freejoint(walker)
  physics.bind(freejoint).qpos = qpos[:7]
  physics.bind(freejoint).qvel = qvel[:6]

  physics.bind(walker.mocap_joints).qpos = qpos[7:]
  physics.bind(walker.mocap_joints).qvel = qvel[6:]
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
  positions = features['prop_positions']
  quaternions = features['prop_quaternions']
  if np.isscalar(z_offset):
    z_offset = np.array([0., 0., z_offset])
  for prop, pos, quat in zip(props, positions, quaternions):
    prop.set_pose(physics, pos + z_offset, quat)


def get_features(physics, walker, props=None):
  """Extracts the walker feature dict used by tracking rewards."""
  walker_bodies = walker.mocap_tracking_bodies

  features = {}
  root_pos, root_quat = walker.get_pose(physics)
  features['position'] = np.array(root_pos)
  features['quaternion'] = np.array(root_quat)
  features['joints'] = np.array(physics.bind(walker.mocap_joints).qpos)

  frame = mjcf.get_attachment_frame(walker.mjcf_model)
  features['center_of_mass'] = np.array(physics.bind(frame).subtree_com)
  end_effectors = np.array(
      walker.observables.end_effectors_pos(physics)[:]).reshape(-1, 3)
  features['end_effectors'] = end_effectors
  if hasattr(walker.observables, 'appendages_pos'):
    appendages = np.array(
        walker.observables.appendages_pos(physics)[:]).reshape(-1, 3)
  else:
    appendages = np.array(end_effectors)
  features['appendages'] = appendages
  features['body_positions'] = np.array(physics.bind(walker_bodies).xpos)
  features['body_quaternions'] = np.array(physics.bind(walker_bodies).xquat)
  root_vel, root_angvel = walker.get_velocity(physics)
  features['velocity'] = np.array(root_vel)
  features['angular_velocity'] = np.array(root_angvel)
  features['joints_velocity'] = np.array(
      physics.bind(walker.mocap_joints).qvel)

  if props:
    positions, quaternions = [], []
    for prop in props:
      pos, quat = prop.get_pose(physics)
      positions.append(pos)
      quaternions.append(quat)
    features['prop_positions'] = np.array(positions)
    features['prop_quaternions'] = np.array(quaternions)
  return features
