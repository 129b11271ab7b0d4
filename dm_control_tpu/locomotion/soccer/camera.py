"""Multiplayer tracking camera
(behavioural counterpart of reference
dm_control/locomotion/soccer/camera.py:24-119): keeps a top camera
framing all tracked entities with smoothed motion.
"""

import numpy as np


class MultiplayerTrackingCamera:
  """Smoothly tracks the centroid of the ball and all players."""

  def __init__(self, min_distance=10., distance_factor=1.,
               smoothing_update_speed=0.1, azimuth=90, elevation=-45,
               width=1920, height=1080):
    self._min_distance = min_distance
    self._distance_factor = distance_factor
    self._smoothing_update_speed = smoothing_update_speed
    self._azimuth = azimuth
    self._elevation = elevation
    self._width = width
    self._height = height
    self._physics = None
    self._camera_state = None

  def after_compile(self, physics):
    self._physics = physics

  @property
  def camera(self):
    return self._camera_state

  def _target_state(self, entity_positions):
    pts = np.asarray(entity_positions)
    center = pts.mean(axis=0)
    spread = float(np.max(np.linalg.norm(pts - center, axis=-1),
                          initial=0.0))
    distance = max(self._min_distance,
                   self._distance_factor * 2 * spread)
    return dict(lookat=center, distance=distance,
                azimuth=self._azimuth, elevation=self._elevation)

  def initialize_episode(self, entity_positions):
    self._camera_state = self._target_state(entity_positions)

  def after_step(self, entity_positions):
    target = self._target_state(entity_positions)
    s = self._smoothing_update_speed
    cur = self._camera_state or target
    self._camera_state = dict(
        lookat=(1 - s) * np.asarray(cur['lookat']) + s * target['lookat'],
        distance=(1 - s) * cur['distance'] + s * target['distance'],
        azimuth=self._azimuth, elevation=self._elevation)

  def render(self):
    """Renders the tracked view through the physics' ray-caster."""
    if self._physics is None or self._camera_state is None:
      raise RuntimeError('camera not initialized')
    from dm_control_tpu.mujoco import engine
    cam = engine.MovableCamera(self._physics, height=self._height,
                               width=self._width)
    st = self._camera_state
    cam.set_pose(st['lookat'], st['distance'], st['azimuth'],
                 st['elevation'])
    return cam.render()
