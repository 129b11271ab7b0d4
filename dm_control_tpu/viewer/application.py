"""Viewer application: interactive playback loop over the TPU renderer
(behavioural counterpart of reference
dm_control/viewer/application.py:179-333).

The reference opens a GLFW window; this build is headless-first — the
`Application` drives the same runtime state machine, keyboard map, and
camera, rendering frames through the on-device ray-caster. Frames go to
an optional `frame_callback` (embedders: notebooks, video writers,
remote streamers); `DM_CONTROL_TPU_VIEWER_DIR` dumps them as .npy for
offline inspection.
"""

import os
import time

import numpy as np

from dm_control_tpu.mujoco import engine
from dm_control_tpu.viewer import runtime as runtime_module
from dm_control_tpu.viewer import user_input
from dm_control_tpu.viewer import util
from dm_control_tpu.viewer import views

_DOUBLE_BUFFERING = 2
_DEFAULT_WIDTH = 320
_DEFAULT_HEIGHT = 240

_MAX_FRONTBUFFER_SIZE = 2048

_SPEED_FACTORS = (1.0, 1.0 / 2, 1.0 / 4, 1.0 / 8, 1.0 / 16, 1.0 / 32,
                  2.0, 4.0, 8.0)


class TimeMultiplier:
  """Adjustable playback speed factor."""

  def __init__(self, initial_time_multiplier=1.0):
    self._factor = initial_time_multiplier

  def get(self):
    return self._factor

  def increase(self):
    self._factor = min(self._factor * 2., 8.)

  def decrease(self):
    self._factor = max(self._factor / 2., 1. / 32.)

  def __str__(self):
    if self._factor >= 1:
      return '%dx' % int(self._factor)
    return '1/%dx' % int(round(1. / self._factor))


class Help(views.ColumnTextModel):
  """The help screen shown with F1."""

  def __init__(self):
    self._value = [
        ('Help', 'F1'),
        ('Speed Up', '='),
        ('Slow Down', '-'),
        ('Switch Camera', '[ ]'),
        ('Pause', 'Space'),
        ('Restart', 'Backspace'),
        ('Advance Step', 'Right Arrow'),
    ]

  def get_columns(self):
    return self._value


class Status(views.ColumnTextModel):
  """Status lines: state, time, speed, fps."""

  def __init__(self, application):
    self._app = application

  def get_columns(self):
    app = self._app
    rt = app.runtime
    rows = [('Status', rt.state.name if rt else 'NO ENV'),
            ('Speed', str(app.time_multiplier)),
            ('Paused', str(app.paused.value))]
    if rt is not None:
      rows.append(('Time', '%.3f s' % rt.get_time()))
    rows.append(('FPS', '%.1f' % app.fps.value))
    return rows


class Application:
  """Headless-capable viewer application."""

  def __init__(self, title='Explorer', width=_DEFAULT_WIDTH,
               height=_DEFAULT_HEIGHT, frame_callback=None):
    self._title = title
    self._width = width
    self._height = height
    self._frame_callback = frame_callback
    self._dump_dir = os.environ.get('DM_CONTROL_TPU_VIEWER_DIR')
    if self._dump_dir:
      os.makedirs(self._dump_dir, exist_ok=True)

    self.paused = util.ObservableFlag(False)
    self.time_multiplier = TimeMultiplier(1.)
    self.fps = util.Integrator()
    self._frame_timer = util.Timer()

    self._runtime = None
    self._environment_loader = None
    self._policy = None
    self._deferred_reload = False
    self._frame_count = 0

    # interactive layer: free-camera orbit/pan/zoom, camera cycling,
    # and body drag-perturbation (viewer/interaction.py)
    from dm_control_tpu.viewer import interaction
    self.free_camera = interaction.FreeCameraController()
    self.camera_select = interaction.CameraSelector(self.free_camera)
    self.perturbation = interaction.DragPerturbation()
    self._last_camera = None
    self._mouse_button = None
    self._cursor = (0.5, 0.5)

    self._input_map = user_input.InputMap()
    self._layout = views.ViewportLayout()
    self._status = views.ColumnTextView(
        Status(self), location=views.PanelLocation.BOTTOM_LEFT)
    self._help = views.ColumnTextView(
        Help(), location=views.PanelLocation.TOP_LEFT)
    self._layout.add(self._status)
    self._bind_keys()

  # -- wiring ---------------------------------------------------------------

  def _bind_keys(self):
    im = self._input_map
    im.bind(self.paused.toggle, user_input.KEY_SPACE)
    im.bind(self._restart_runtime, user_input.KEY_BACKSPACE)
    im.bind(self._advance_step, user_input.KEY_RIGHT)
    im.bind(self.time_multiplier.increase, user_input.KEY_EQUAL)
    im.bind(self.time_multiplier.decrease, user_input.KEY_MINUS)
    im.bind(self._next_camera, user_input.KEY_TAB)
    im.bind(self._toggle_help, user_input.KEY_F1)

  @property
  def runtime(self):
    return self._runtime

  @property
  def input_map(self):
    """The key map — embedders feed events via handle_key."""
    return self._input_map

  def handle_key(self, key, action=user_input.PRESS,
                 modifiers=user_input.MOD_NONE):
    return self._input_map.handle_key(key, action, modifiers)

  def _toggle_help(self):
    if self._help in list(self._layout._views):
      self._layout.remove(self._help)
    else:
      self._layout.add(self._help)

  def _next_camera(self):
    n_cams = 0
    if self._runtime is not None:
      n_cams = int(getattr(
          self._runtime.environment.physics.model, 'ncam', 0))
    self.camera_select.advance(n_cams)

  # -- mouse interaction -----------------------------------------------------

  def handle_mouse_press(self, button, cursor, modifiers=0):
    """button: 'left' | 'right' | 'middle'; cursor in [0,1]^2 with
    (0,0) at the bottom-left. Ctrl+left grabs the body under the
    cursor for drag perturbation."""
    self._mouse_button = button
    self._cursor = tuple(cursor)
    ctrl_held = bool(modifiers & user_input.MOD_CONTROL)
    if (button == 'left' and ctrl_held and self._runtime is not None
        and self._last_camera is not None):
      physics = self._runtime.environment.physics
      self.perturbation.grab(physics, self._last_camera, cursor)

  def handle_mouse_move(self, cursor):
    """Pointer motion while a button is held."""
    dx = (cursor[0] - self._cursor[0]) * self._width
    dy = (cursor[1] - self._cursor[1]) * self._height
    self._cursor = tuple(cursor)
    if self.perturbation.active and self._last_camera is not None:
      self.perturbation.drag(self._last_camera, cursor)
    elif self._mouse_button == 'left':
      self.free_camera.orbit(dx, -dy)
    elif self._mouse_button == 'right':
      self.free_camera.pan(dx, dy)

  def handle_mouse_release(self, button):
    del button
    self._mouse_button = None
    if self._runtime is not None:
      self.perturbation.release(self._runtime.environment.physics)

  def handle_scroll(self, steps):
    self.free_camera.zoom(steps)

  def _advance_step(self):
    if self._runtime:
      self._runtime.single_step()

  def _restart_runtime(self):
    if self._runtime:
      self._runtime.restart()

  def _load_environment(self, zero_sim_time=True):
    del zero_sim_time
    if self._environment_loader is None:
      return
    environment = self._environment_loader()
    self._runtime = runtime_module.Runtime(
        environment=environment, policy=self._policy)
    self._deferred_reload = False

  # -- rendering ------------------------------------------------------------

  def _render_frame(self):
    physics = self._runtime.environment.physics
    cam = self.camera_select.make_camera(physics, width=self._width,
                                         height=self._height)
    self._last_camera = cam
    pixels = np.asarray(cam.render())
    overlays = self._layout.render()
    if self._frame_callback is not None:
      self._frame_callback(pixels, overlays)
    if self._dump_dir:
      np.save(os.path.join(
          self._dump_dir, 'frame_%06d.npy' % self._frame_count), pixels)
    self._frame_count += 1
    return pixels

  def _tick(self):
    if self._deferred_reload:
      self._load_environment()
    time_elapsed = self._frame_timer.tick() * self.time_multiplier.get()
    if self._runtime is not None:
      if self.perturbation.active:
        self.perturbation.apply(self._runtime.environment.physics)
      with self._frame_timer.measure_time():
        self._runtime.tick(time_elapsed, self.paused.value)
      if self._frame_timer.measured_time:
        self.fps.value = 1. / max(self._frame_timer.measured_time, 1e-6)
      return self._render_frame()
    return None

  # -- entry point ------------------------------------------------------------

  def launch(self, environment_loader, policy=None, max_frames=None,
             realtime=False):
    """Runs the playback loop.

    Args:
      environment_loader: callable returning a dm_env Environment, or
        an Environment instance.
      policy: optional callable TimeStep -> action.
      max_frames: stop after this many frames (None: run until the
        runtime STOPPEDs — one episode for environments that end).
      realtime: sleep to pace frames at ~60Hz wall clock.
    """
    if environment_loader is None:
      raise ValueError('environment_loader is required')
    if callable(environment_loader):
      self._environment_loader = environment_loader
    else:
      self._environment_loader = lambda: environment_loader
    self._policy = policy
    self._load_environment()
    frames = 0
    while True:
      self._tick()
      frames += 1
      if max_frames is not None and frames >= max_frames:
        break
      if self._runtime.state == runtime_module.State.STOPPED:
        break
      if realtime:
        time.sleep(1. / 60.)
    return frames


def launch(environment_loader, policy=None, title='Explorer',
           width=_DEFAULT_WIDTH, height=_DEFAULT_HEIGHT,
           frame_callback=None, max_frames=None):
  """Launches the viewer (reference viewer.launch signature + headless
  extensions)."""
  app = Application(title=title, width=width, height=height,
                    frame_callback=frame_callback)
  app.launch(environment_loader=environment_loader, policy=policy,
             max_frames=max_frames)
  return app
