"""Corridor locomotion tasks.

Behavioral contract: reference locomotion/tasks/corridors.py
RunThroughCorridor — reward for moving along the corridor's x-axis at
a target speed, optional termination when anything but the walker's
feet touches the ground.
"""

from __future__ import annotations

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu.utils import rewards


class RunThroughCorridor(composer.Task):
  """Reward running along the corridor's x-axis at a target speed."""

  def __init__(self,
               walker,
               arena,
               walker_spawn_position=(0, 0, 0),
               walker_spawn_rotation=None,
               target_velocity=3.0,
               contact_termination: bool = False,
               physics_timestep=0.005,
               control_timestep=0.025):
    self._arena = arena
    self._walker = walker
    self._spawn_frame = arena.add_free_entity(walker)
    self._spawn_position = np.asarray(walker_spawn_position, np.float64)
    self._spawn_rotation = walker_spawn_rotation
    self._vel = target_velocity
    self._contact_termination = contact_termination
    self._failure_termination = False

    walker.observables.enable_proprioception()
    for obs in walker.observables.kinematic_sensors:
      obs.enabled = True

    self.set_timesteps(control_timestep, physics_timestep)

  root_entity = property(lambda self: self._arena)

  def initialize_episode_mjcf(self, random_state):
    self._arena.regenerate(random_state)

  def _collect_geom_ids(self, physics):
    """(walker body geoms minus feet, arena ground geoms) as id sets."""
    from dm_control_tpu.mjcf import physics as mjcf_physics
    all_geoms = mjcf_physics._doc_order_elements(
        physics.mjcf_model, 'geom')
    index_of = {id(g): i for i, g in enumerate(all_geoms)}
    feet = {id(g) for g in self._walker.ground_contact_geoms}
    body = {index_of[id(g)]
            for g in self._walker.mjcf_model.find_all('geom')
            if id(g) in index_of and id(g) not in feet}
    ground = {index_of[id(g)] for g in self._arena.ground_geoms
              if id(g) in index_of}
    return body, ground

  def initialize_episode(self, physics, random_state):
    self._failure_termination = False
    if self._spawn_rotation is not None:
      half = self._spawn_rotation / 2
      quat = [np.cos(half), 0, 0, np.sin(half)]
    else:
      quat = None
    self._walker.set_pose(
        physics,
        position=self._spawn_position + np.array([0, 0, 0.06]),
        quaternion=quat)
    if self._contact_termination:
      self._body_ids, self._ground_ids = self._collect_geom_ids(physics)

  def after_step(self, physics, random_state):
    del random_state
    if not self._contact_termination:
      return
    con = physics.data.contact
    active = np.asarray(con.active).astype(bool)
    g1 = np.asarray(con.geom1)[active]
    g2 = np.asarray(con.geom2)[active]
    for a, b in zip(g1.tolist(), g2.tolist()):
      if ((a in self._ground_ids and b in self._body_ids) or
          (b in self._ground_ids and a in self._body_ids)):
        self._failure_termination = True
        return

  def get_reward(self, physics):
    # world-x speed of the walker root (reference corridors.py reward)
    velocity, _ = self._walker.get_velocity(physics)
    return float(rewards.tolerance(
        float(np.asarray(velocity)[0]),
        bounds=(self._vel, float('inf')),
        margin=self._vel, value_at_margin=0, sigmoid='linear'))

  def should_terminate_episode(self, physics):
    return self._failure_termination

  def get_discount(self, physics):
    return 0.0 if self._failure_termination else 1.0
