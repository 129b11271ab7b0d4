"""A non-colliding sphere that detects touch by proximity
(reference locomotion/props/target_sphere.py:22-80)."""

from __future__ import annotations

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu import mjcf


class TargetSphere(composer.Entity):
  """Intangible sphere that 'activates' when an entity comes close.

  The reference detects activation through a touch sensor on an
  inverted site; the TPU build tests proximity of the tracked body to
  the target center each step — same behavioural contract (one-shot
  activation, queryable, reset per episode).
  """

  def _build(self, radius=0.6, height_above_ground=1,
             rgb1=(0, 0.4, 0), rgb2=(0, 0.7, 0), name='target'):
    self._mjcf_root = mjcf.RootElement(model=name)
    self._geom = self._mjcf_root.worldbody.add(
        'geom', name='geom', type='sphere',
        pos=[0, 0, height_above_ground], size=[radius],
        rgba=list(rgb1) + [1], contype=0, conaffinity=0, mass=0)
    self._radius = radius
    self._height = height_above_ground
    self._activated = False

  @property
  def mjcf_model(self):
    return self._mjcf_root

  @property
  def geom(self):
    return self._geom

  @property
  def activated(self):
    return self._activated

  def reset(self, physics=None):
    self._activated = False

  def initialize_episode(self, physics, random_state):
    self._activated = False

  def maybe_activate(self, physics, position) -> bool:
    """Activates if `position` is inside the sphere; returns state."""
    if not self._activated:
      center = np.asarray(physics.bind(self._geom).xpos)
      if np.linalg.norm(np.asarray(position) - center) < self._radius:
        self._activated = True
    return self._activated


class TargetSphereTwoTouch(composer.Entity):
  """A sphere tracking a two-bit (touched once, touched twice) state.

  Counterpart of the reference's touch-sensor prop (reference
  locomotion/props/target_sphere.py:113-220): activation is latched for
  the episode, with a debounce interval between the first and second
  touch. Touch is detected by proximity of registered tracked geoms
  (e.g. a walker's hands) to the sphere center.
  """

  def _build(self, radius=0.6, height_above_ground=1,
             rgb_initial=((0, 0.4, 0), (0, 0.7, 0)),
             rgb_interval=((1., 1., .4), (0.7, 0.7, 0.)),
             rgb_final=((.4, 0.7, 1.), (0, 0.4, .7)),
             touch_debounce=.2, specific_collision_geom_ids=None,
             name='target'):
    del rgb_interval, rgb_final  # colour phases are render-only
    self._mjcf_root = mjcf.RootElement(model=name)
    self._geom = self._mjcf_root.worldbody.add(
        'geom', name='geom', type='sphere',
        pos=[0, 0, height_above_ground], size=[radius],
        rgba=list(rgb_initial[0]) + [1], contype=0, conaffinity=0,
        mass=0)
    self._radius = radius
    self._touch_debounce = touch_debounce
    self._specific_collision_geom_ids = specific_collision_geom_ids
    self._collision_geoms = ()   # mjcf geom elements to track
    self._touched_once = False
    self._touched_twice = False
    self._touch_time = None

  @property
  def mjcf_model(self):
    return self._mjcf_root

  @property
  def geom(self):
    return self._geom

  @property
  def activated(self):
    return (self._touched_once, self._touched_twice)

  def register_collision_geoms(self, geoms):
    """Geoms whose proximity to the sphere counts as a touch."""
    self._collision_geoms = tuple(geoms)

  def reset(self, physics=None):
    del physics
    self._touched_once = False
    self._touched_twice = False
    self._touch_time = None

  def initialize_episode(self, physics, random_state):
    del physics, random_state
    self.reset()

  def after_substep(self, physics, random_state):
    del random_state
    if self._touched_twice or not self._collision_geoms:
      return
    center = np.asarray(physics.bind(self._geom).xpos)
    pts = np.asarray(physics.bind(list(self._collision_geoms)).xpos)
    touching = bool(
        np.any(np.linalg.norm(pts.reshape(-1, 3) - center, axis=-1)
               < self._radius))
    now = physics.time()
    if touching:
      if not self._touched_once:
        self._touched_once = True
        self._touch_time = now
      elif now > self._touch_time + self._touch_debounce:
        self._touched_twice = True
