"""Escape-the-bowl locomotion task.

Behavioral contract: reference locomotion/tasks/escape.py — reward =
(linear distance-from-origin ramp, saturating at the terrain radius)
gated by an uprightness term; walker dropped contact-free at a random
orientation; `origin` egocentric observable.
"""

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu.composer.observation import observable as base_observable
from dm_control_tpu.utils import rewards

_HEIGHTFIELD_ID = 0

# walker class name fragment -> (core body, reward body) names; the
# core body frames the 'origin' observation, the reward body's
# distance from the bowl center is what pays (reference escape.py:71-79)
_BODY_TABLE = (
    ('CMUHumanoid', 'root', 'root'),
    ('Rat', 'torso', 'head'),
    ('Rodent', 'torso', 'head'),
)


def _select_bodies(walker):
  cls = str(type(walker))
  for fragment, core, reward in _BODY_TABLE:
    if fragment in cls:
      find = walker.mjcf_model.find
      return find('body', core), find('body', reward)
  return walker.root_body, walker.root_body


def drop_contact_free(physics, walker, orientation, xy=(0.0, 0.0),
                      step=0.01, maxiter=1000):
  """Raises the walker until no geom penetrates, in `step` increments."""
  for i in range(maxiter):
    walker.set_pose(physics, position=(xy[0], xy[1], i * step),
                    quaternion=orientation)
    physics.forward()
    if not np.any(np.asarray(physics.data.contact.dist) < 0):
      return
  raise ValueError(
      'maxiter reached: possibly contacts in null pose of body.')


def _uprightness(physics, walker, deviation_angle=0):
  """Linear ramp on the z-alignment of torso (and pelvis if present)."""
  bodies = [walker.root_body]
  if hasattr(walker, 'pelvis_body'):
    bodies.append(walker.pelvis_body)
  zz = np.array([np.array(physics.bind(b).xmat).ravel()[-1]
                 for b in bodies])
  floor = np.cos(np.deg2rad(deviation_angle))
  return np.min(rewards.tolerance(
      zz, bounds=(floor, float('inf')), sigmoid='linear',
      margin=1 + floor, value_at_margin=0))


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
    walker.create_root_joints(arena.attach(walker))
    self._walker_spawn_position = walker_spawn_position
    self._walker_spawn_rotation = walker_spawn_rotation
    self._core_body, self._reward_body = _select_bodies(walker)

    wants = (walker.observables.proprioception
             + walker.observables.kinematic_sensors
             + walker.observables.dynamic_sensors)
    if hasattr(walker.observables, 'sensors_touch'):
      wants.append(walker.observables.sensors_touch)
    if walker.egocentric_camera is not None:
      wants.append(walker.observables.egocentric_camera)
    for obs in wants:
      obs.enabled = True

    def origin_in_core_frame(physics):
      core = physics.bind(self._core_body)
      frame = np.array(core.xmat).reshape(3, 3)
      return -np.array(core.xpos).dot(frame)

    walker.observables.add_observable(
        'origin', base_observable.Generic(origin_in_core_frame),
        enabled=True)

    self.set_timesteps(physics_timestep=physics_timestep,
                       control_timestep=control_timestep)

  root_entity = property(lambda self: self._arena)

  def initialize_episode_mjcf(self, random_state):
    if hasattr(self._arena, 'regenerate'):
      self._arena.regenerate(random_state)

  def initialize_episode(self, physics, random_state):
    orientation = random_state.randn(4)
    drop_contact_free(physics, self._walker,
                      orientation / np.linalg.norm(orientation))

  def get_reward(self, physics):
    radius = float(
        np.asarray(physics.model.hfield_size)[_HEIGHTFIELD_ID, 0])
    escaped = rewards.tolerance(
        np.linalg.norm(np.array(physics.bind(self._reward_body).xpos)),
        bounds=(radius, float('inf')), margin=radius,
        value_at_margin=0, sigmoid='linear')
    return float(
        _uprightness(physics, self._walker, deviation_angle=30)
        * escaped)

  def get_discount(self, physics):
    del physics
    return 1.
