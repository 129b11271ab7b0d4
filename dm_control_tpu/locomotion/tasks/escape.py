"""Escape-the-bowl locomotion task
(behavioural counterpart of reference
dm_control/locomotion/tasks/escape.py:29-184).
"""

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu.composer.observation import observable as base_observable
from dm_control_tpu.utils import rewards

_HEIGHTFIELD_ID = 0


class Escape(composer.Task):
  """Escape a starting area (e.g. bowl-shaped terrain)."""

  def __init__(self,
               walker,
               arena,
               walker_spawn_position=(0, 0, 0),
               walker_spawn_rotation=None,
               physics_timestep=0.005,
               control_timestep=0.025):
    self._arena = arena
    self._walker = walker
    self._walker.create_root_joints(self._arena.attach(self._walker))
    self._walker_spawn_position = walker_spawn_position
    self._walker_spawn_rotation = walker_spawn_rotation

    enabled_observables = []
    enabled_observables += self._walker.observables.proprioception
    enabled_observables += self._walker.observables.kinematic_sensors
    enabled_observables += self._walker.observables.dynamic_sensors
    if hasattr(self._walker.observables, 'sensors_touch'):
      enabled_observables.append(self._walker.observables.sensors_touch)
    if self._walker.egocentric_camera is not None:
      enabled_observables.append(
          self._walker.observables.egocentric_camera)
    for obs in enabled_observables:
      obs.enabled = True

    # core body: frame for the 'origin' observation; reward body: whose
    # distance from the bowl center is rewarded (reference escape.py:71-79)
    walker_type = str(type(self._walker))
    if 'CMUHumanoid' in walker_type:
      self._core_body = self._walker.mjcf_model.find('body', 'root')
      self._reward_body = self._core_body
    elif 'Rat' in walker_type or 'Rodent' in walker_type:
      self._core_body = self._walker.mjcf_model.find('body', 'torso')
      self._reward_body = self._walker.mjcf_model.find('body', 'head')
    else:
      self._core_body = self._walker.root_body
      self._reward_body = self._walker.root_body

    def _origin(physics):
      """Origin position in the core-body frame."""
      core = physics.bind(self._core_body)
      frame = np.array(core.xmat).reshape(3, 3)
      return -np.array(core.xpos).dot(frame)

    self._walker.observables.add_observable(
        'origin', base_observable.Generic(_origin), enabled=True)

    self.set_timesteps(physics_timestep=physics_timestep,
                       control_timestep=control_timestep)

  @property
  def root_entity(self):
    return self._arena

  def initialize_episode_mjcf(self, random_state):
    if hasattr(self._arena, 'regenerate'):
      self._arena.regenerate(random_state)

  def initialize_episode(self, physics, random_state):
    orientation = random_state.randn(4)
    orientation /= np.linalg.norm(orientation)
    _find_non_contacting_height(physics, self._walker, orientation)

  def get_reward(self, physics):
    terrain_size = float(
        np.asarray(physics.model.hfield_size)[_HEIGHTFIELD_ID, 0])
    reward_pos = np.array(physics.bind(self._reward_body).xpos)
    escape_reward = rewards.tolerance(
        np.linalg.norm(reward_pos),
        bounds=(terrain_size, float('inf')),
        margin=terrain_size,
        value_at_margin=0,
        sigmoid='linear')
    upright_reward = _upright_reward(
        physics, self._walker, deviation_angle=30)
    return float(upright_reward * escape_reward)

  def get_discount(self, physics):
    del physics
    return 1.


def _find_non_contacting_height(physics, walker, orientation,
                                x_pos=0.0, y_pos=0.0, maxiter=1000):
  """Raise the walker in 1cm steps until it is contact-free."""
  z_pos = 0.0
  count = 1
  while True:
    walker.set_pose(physics,
                    position=(x_pos, y_pos, z_pos),
                    quaternion=orientation)
    physics.forward()
    contact = physics.data.contact
    num_contacts = int(np.sum(np.asarray(contact.dist) < 0))
    if num_contacts == 0:
      break
    z_pos += 0.01
    count += 1
    if count > maxiter:
      raise ValueError(
          'maxiter reached: possibly contacts in null pose of body.')


def _upright_reward(physics, walker, deviation_angle=0):
  """Reward proportional to how upright the walker's torso is."""
  deviation = np.cos(np.deg2rad(deviation_angle))
  upright_torso = np.array(physics.bind(walker.root_body).xmat).ravel()[-1]
  if hasattr(walker, 'pelvis_body'):
    upright_pelvis = np.array(
        physics.bind(walker.pelvis_body).xmat).ravel()[-1]
    upright_zz = np.stack([upright_torso, upright_pelvis])
  else:
    upright_zz = upright_torso
  upright = rewards.tolerance(upright_zz,
                              bounds=(deviation, float('inf')),
                              sigmoid='linear',
                              margin=1 + deviation,
                              value_at_margin=0)
  return np.min(upright)
