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
