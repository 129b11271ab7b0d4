"""Interactive viewer layer: camera control and drag perturbation.

Behavioral contract: reference viewer/viewer.py CameraSelector (:281),
FreeCameraController (:340), ManipulationController (:460) and
renderer.Perturbation (:210-284) — mapped onto the headless
application's input layer. Perturbation forces ride the engine's
`xfrc_applied` path (ops/forward.fwd_acceleration), so a dragged body
feels a spring-damper pull toward the cursor exactly like the
reference's mjv_applyPerturbForce route.
"""

from __future__ import annotations

import numpy as np

from dm_control_tpu.mujoco import engine

# spring/damper gains of the drag perturbation, scaled by body mass
_DRAG_STIFFNESS = 100.0
_DRAG_DAMPING = 20.0

_ORBIT_PER_PIXEL = 0.25      # degrees of azimuth/elevation per pixel
_PAN_PER_PIXEL = 0.003       # lookat meters per pixel per distance
_ZOOM_RATE = 1.08


class FreeCameraController:
  """Orbit / pan / zoom state for the free camera."""

  def __init__(self):
    self._pose = None

  def adopt(self, camera: engine.MovableCamera):
    """Applies the tracked pose to `camera` (first call adopts the
    camera's default pose)."""
    if self._pose is None:
      self._pose = camera.get_pose()
    else:
      camera.set_pose(*self._pose)
    return camera

  @property
  def pose(self):
    return self._pose

  def _update(self, **changes):
    if self._pose is None:
      return
    fields = self._pose._asdict()
    fields.update(changes)
    self._pose = type(self._pose)(**fields)

  def orbit(self, dx_pixels, dy_pixels):
    if self._pose is None:
      return
    self._update(
        azimuth=self._pose.azimuth - _ORBIT_PER_PIXEL * dx_pixels,
        elevation=np.clip(
            self._pose.elevation - _ORBIT_PER_PIXEL * dy_pixels,
            -89.0, 89.0))

  def pan(self, dx_pixels, dy_pixels):
    if self._pose is None:
      return
    az = np.deg2rad(self._pose.azimuth)
    right = np.array([-np.sin(az), np.cos(az), 0.0])
    up = np.array([0.0, 0.0, 1.0])
    step = _PAN_PER_PIXEL * self._pose.distance
    lookat = (np.asarray(self._pose.lookat)
              - right * dx_pixels * step + up * dy_pixels * step)
    self._update(lookat=lookat)

  def zoom(self, steps):
    if self._pose is None:
      return
    self._update(
        distance=self._pose.distance * _ZOOM_RATE ** (-steps))


class CameraSelector:
  """Cycles through [free camera, fixed cameras...]."""

  FREE = -1

  def __init__(self, free_controller: FreeCameraController):
    self._free = free_controller
    self._index = self.FREE

  @property
  def camera_id(self):
    return self._index

  def advance(self, n_fixed_cameras):
    self._index += 1
    if self._index >= n_fixed_cameras:
      self._index = self.FREE

  def make_camera(self, physics, width, height):
    n_cams = int(getattr(physics.model, 'ncam', 0))
    if self._index >= n_cams:
      self._index = self.FREE
    if self._index == self.FREE:
      return self._free.adopt(engine.MovableCamera(
          physics, width=width, height=height))
    return engine.Camera(physics, width=width, height=height,
                         camera_id=self._index)


class DragPerturbation:
  """Grab a body under the cursor and pull it toward the drag point."""

  def __init__(self):
    self._body_id = None
    self._target = None
    self._depth = None

  @property
  def active(self):
    return self._body_id is not None and self._body_id > 0

  @property
  def body_id(self):
    return self._body_id

  def grab(self, physics, camera, cursor):
    """Starts a drag at `cursor` ((x, y) in [0,1]^2). Returns the
    grabbed body id or None."""
    selected = camera.select(cursor)
    if selected.body is None or selected.body <= 0:
      self.release(physics)
      return None
    self._body_id = int(selected.body)
    self._target = np.asarray(selected.world_position, dtype=float)
    pos, _, _ = camera._pose_and_fov()
    self._depth = float(np.linalg.norm(
        self._target - np.asarray(pos)))
    return self._body_id

  def drag(self, camera, cursor):
    """Moves the pull target to `cursor`, at the grab depth."""
    if not self.active:
      return
    pos, mat, fovy = camera._pose_and_fov()
    tan_half = np.tan(np.deg2rad(fovy) / 2.0)
    aspect = camera._width / camera._height
    x_cam = (2.0 * cursor[0] - 1.0) * tan_half * aspect
    y_cam = (2.0 * cursor[1] - 1.0) * tan_half
    direction = np.asarray(mat) @ np.array([x_cam, y_cam, -1.0])
    direction = direction / np.linalg.norm(direction)
    self._target = np.asarray(pos) + self._depth * direction

  def apply(self, physics):
    """Writes the spring-damper wrench into xfrc_applied (call every
    tick while a drag is active)."""
    import jax
    nbody = int(physics.model.nbody)
    wrench = np.zeros((nbody, 6))
    if self.active:
      b = self._body_id
      xpos = np.asarray(jax.device_get(physics.data.xipos))[b]
      cvel = np.asarray(jax.device_get(physics.data.cvel))[b]
      mass = float(np.asarray(physics.model.body_mass)[b])
      force = mass * (_DRAG_STIFFNESS * (self._target - xpos)
                      - _DRAG_DAMPING * cvel[3:])
      wrench[b, :3] = force
    physics._set_field('data', 'xfrc_applied', wrench)

  def release(self, physics):
    self._body_id = None
    self._target = None
    if physics is not None:
      physics._set_field(
          'data', 'xfrc_applied',
          np.zeros((int(physics.model.nbody), 6)))
