"""`Physics`: the stateful convenience wrapper over (Model, Data).

API-parity layer for the reference dm_control.mujoco.Physics surface
(reference dm_control/mujoco/engine.py:83-430): load/reset/step/forward,
state get/set, named indexing, divergence -> PhysicsError. Internally
everything is the pure functional engine; this class stages host-side
writes and commits them at step/forward boundaries (the mutable-view-on
-immutable-substrate design from SURVEY.md §7).

The hot path for RL training is NOT this class — use the jitted
environments (rl.control / parallel.BatchedEnvironment). This class
exists for interactive use, tooling, tests and API compatibility.
"""

from __future__ import annotations

import collections
import contextlib
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu import models
from dm_control_tpu.models import types
from dm_control_tpu.mujoco import index as index_lib
from dm_control_tpu.ops import forward as forward_ops


class PhysicsError(RuntimeError):
  """Physics state is divergent (NaN / overflow)."""


Selected = collections.namedtuple(
    'Selected', ['body', 'geom', 'flex', 'skin', 'world_position'])

Pose = collections.namedtuple(
    'Pose', ['lookat', 'distance', 'azimuth', 'elevation'])


class CameraMatrices(NamedTuple):
  """Component matrices of the 3x4 camera matrix
  (reference dm_control/mujoco/engine.py:625-639)."""
  image: np.ndarray        # (3, 3)
  focal: np.ndarray        # (3, 4)
  rotation: np.ndarray     # (4, 4)
  translation: np.ndarray  # (4, 4)


class _Named:

  def __init__(self, physics):
    axes = index_lib.make_axes(physics.model)
    model_fields, data_fields, mat_fields = index_lib.build_tables(
        physics.model, physics.data)
    self.data = index_lib.NamedView(
        physics, data_fields, mat_fields, axes, 'data')
    self.model = index_lib.NamedView(
        physics, model_fields, None, axes, 'model')
    self.model_fields = model_fields
    self.data_fields = data_fields
    self.data_mat_fields = mat_fields


class Physics:
  """Stateful simulation handle."""

  def __init__(self, model: types.Model):
    self._model = model
    self._model_dev = jax.device_put(model)
    self._data = types.make_data(model)
    self._host_cache = {}      # field -> numpy staging/mirror
    self._dirty_fields = set()
    self._model_dirty = set()
    self._step_fn = jax.jit(forward_ops.step)
    self._step_legacy_fn = jax.jit(forward_ops.step_legacy)
    self._forward_fn = jax.jit(forward_ops.forward)
    self._named = None
    self.legacy_step = True
    self.forward()

  # ---------------- constructors ----------------
  @classmethod
  def _from_parts(cls, model, model_dev, data) -> 'Physics':
    """Builds a Physics over existing device-resident (model, data)
    without re-running forward() — used for views shared with a jitted
    environment (rl.control.Environment.physics)."""
    new = cls.__new__(cls)
    new._model = model
    new._model_dev = model_dev
    new._data = data
    new._host_cache = {}
    new._dirty_fields = set()
    new._model_dirty = set()
    new._step_fn = jax.jit(forward_ops.step)
    new._step_legacy_fn = jax.jit(forward_ops.step_legacy)
    new._forward_fn = jax.jit(forward_ops.forward)
    new._named = None
    new.legacy_step = True
    return new

  @classmethod
  def from_xml_string(cls, xml_string, assets=None,
                      **compile_kwargs) -> 'Physics':
    return cls(models.from_xml_string(xml_string, assets=assets,
                                      **compile_kwargs))

  @classmethod
  def from_xml_path(cls, path, assets=None) -> 'Physics':
    return cls(models.from_xml_path(path, assets=assets))

  @classmethod
  def from_model(cls, model: types.Model) -> 'Physics':
    return cls(model)

  # ---------------- field plumbing ----------------
  def _get_field(self, kind, name):
    key = (kind, name)
    if key not in self._host_cache:
      src = self._data if kind == 'data' else self._model_dev
      self._host_cache[key] = np.array(jax.device_get(
          getattr(src, name)))
    return self._host_cache[key]

  def _set_field(self, kind, name, arr):
    key = (kind, name)
    self._host_cache[key] = np.asarray(arr)
    if kind == 'data':
      self._dirty_fields.add(name)
    else:
      self._model_dirty.add(name)

  def _commit(self):
    if self._dirty_fields:
      updates = {f: jnp.asarray(self._host_cache[('data', f)])
                 for f in self._dirty_fields}
      self._data = self._data.replace(**updates)
      self._dirty_fields.clear()
    if self._model_dirty:
      updates = {f: jnp.asarray(self._host_cache[('model', f)])
                 for f in self._model_dirty}
      self._model_dev = self._model_dev.replace(**updates)
      self._model_dirty.clear()

  def _invalidate(self):
    # keep staged writes, drop everything derived
    for key in list(self._host_cache):
      kind, name = key
      if kind == 'data' and name not in self._dirty_fields:
        del self._host_cache[key]

  # ---------------- public surface ----------------
  def update_model_field(self, name: str, value) -> None:
    """Stages a write to a device model array (e.g. `hfield_data`) —
    the counterpart of mutating mjModel in place (reference
    locomotion/arenas/bowl.py writes physics.model.hfield_data)."""
    self._set_field('model', name, value)
    # keep the host model view consistent for immediate readbacks
    self._model = self._model.replace(**{name: np.asarray(value)})

  @property
  def model(self) -> types.Model:
    return self._model

  @property
  def data(self) -> types.Data:
    self._commit()
    return self._data

  @property
  def named(self) -> _Named:
    if self._named is None:
      self._named = _Named(self)
    return self._named

  def step(self, nstep: int = 1) -> None:
    """Advance the simulation nstep physics steps.

    With ``legacy_step`` set (the default, matching reference
    dm_control/mujoco/engine.py:147-162) the step preserves the
    fresh-derived-state invariant: xpos/site_xpos/sensordata read
    after step() reflect the post-integration state. Data is
    position/velocity-fresh on entry because __init__/reset run
    forward() and step_legacy itself ends with the pv stages.
    """
    self._commit()
    fn = self._step_legacy_fn if self.legacy_step else self._step_fn
    for _ in range(nstep):
      self._data = fn(self._model_dev, self._data)
    self._invalidate()
    self.check_divergence()

  def forward(self) -> None:
    """Recompute derived quantities for the current state."""
    self._commit()
    self._data = self._forward_fn(self._model_dev, self._data)
    self._invalidate()

  def after_reset(self) -> None:
    """Runs after qpos/qvel edits outside a reset_context
    (reference engine.py Physics.after_reset)."""
    self.forward()

  def reset(self, keyframe_id: Optional[int] = None) -> None:
    data = types.make_data(self._model)
    if keyframe_id is not None:
      data = data.replace(
          qpos=jnp.asarray(self._model.key_qpos[keyframe_id]),
          qvel=jnp.asarray(self._model.key_qvel[keyframe_id]),
          ctrl=jnp.asarray(self._model.key_ctrl[keyframe_id]))
    self._data = data
    self._host_cache.clear()
    self._dirty_fields.clear()
    self.forward()

  @contextlib.contextmanager
  def reset_context(self):
    """Resets, yields for state edits, then runs forward()."""
    self.reset()
    yield self
    self.forward()

  def set_control(self, control) -> None:
    self._set_field('data', 'ctrl', np.asarray(
        control, dtype=np.float32))

  def control(self):
    return self._get_field('data', 'ctrl').copy()

  def position(self):
    return self._get_field('data', 'qpos').copy()

  def velocity(self):
    return self._get_field('data', 'qvel').copy()

  def activation(self):
    return np.array(jax.device_get(self._data.act))

  def state(self):
    return np.concatenate(
        [self.position(), self.velocity(), self.activation()])

  def get_state(self):
    return self.state()

  def set_state(self, physics_state) -> None:
    nq, nv, na = self._model.nq, self._model.nv, self._model.na
    if physics_state.shape != (nq + nv + na,):
      raise ValueError(
          f'state must have shape ({nq + nv + na},), got '
          f'{physics_state.shape}')
    self._set_field('data', 'qpos', physics_state[:nq])
    self._set_field('data', 'qvel', physics_state[nq:nq + nv])
    if na:
      self._data = self._data.replace(
          act=jnp.asarray(physics_state[nq + nv:]))

  def timestep(self) -> float:
    return float(self._model.opt.timestep)

  def time(self) -> float:
    return float(jax.device_get(self._data.time))

  def check_divergence(self) -> None:
    if bool(jax.device_get(self._data.divergence)):
      raise PhysicsError(
          'Physics state has diverged (NaN or overflow). ')

  @contextlib.contextmanager
  def suppress_physics_errors(self):
    try:
      yield
    except PhysicsError:
      pass

  def copy(self, share_model: bool = True) -> 'Physics':
    new = Physics.__new__(Physics)
    new._model = self._model
    new._model_dev = self._model_dev
    self._commit()
    new._data = self._data
    new._host_cache = {}
    new._dirty_fields = set()
    new._model_dirty = set()
    new._step_fn = self._step_fn
    new._step_legacy_fn = self._step_legacy_fn
    new._forward_fn = self._forward_fn
    new._named = None
    new.legacy_step = self.legacy_step
    return new

  # pickling: state is (model, data) host trees
  def __getstate__(self):
    self._commit()
    return {'model': self._model, 'data': jax.device_get(self._data)}

  def __setstate__(self, state):
    self._model = state['model']
    self._model_dev = jax.device_put(self._model)
    self._data = state['data']
    self._host_cache = {}
    self._dirty_fields = set()
    self._model_dirty = set()
    self._step_fn = jax.jit(forward_ops.step)
    self._step_legacy_fn = jax.jit(forward_ops.step_legacy)
    self._forward_fn = jax.jit(forward_ops.forward)
    self._named = None
    self.legacy_step = True

  def render(self, height: int = 240, width: int = 320,
             camera_id=-1, overlays=(), depth: bool = False,
             segmentation: bool = False, scene_option=None,
             render_flag_overrides=None):
    """Render a frame via the on-device ray-caster.

    Output contracts match the reference Camera.render
    (reference dm_control/mujoco/engine.py:178-233, 840-946): uint8
    RGB, float metric depth, or int32 (objid, objtype) segmentation.
    """
    camera = Camera(self, height=height, width=width,
                    camera_id=camera_id)
    return camera.render(overlays=overlays, depth=depth,
                         segmentation=segmentation,
                         scene_option=scene_option,
                         render_flag_overrides=render_flag_overrides)

  def object_velocity(self, object_id, object_type,
                      local_frame: bool = False):
    """6D velocity of a body/geom/site as stacked (linear, angular)
    (reference dm_control/mujoco/wrapper/core.py:500-525)."""
    from dm_control_tpu.ops import sensor as sensor_ops
    m, d = self._model, self.data
    names = m.names
    if isinstance(object_id, str):
      object_id = names.name2id(object_type, object_id)
    if object_type == 'body':
      bodyid = object_id
      point = d.xpos[object_id]
      rot = d.xmat[object_id]
    elif object_type == 'geom':
      bodyid = int(m.geom_bodyid[object_id])
      point = d.geom_xpos[object_id]
      rot = d.geom_xmat[object_id]
    elif object_type == 'site':
      bodyid = int(m.site_bodyid[object_id])
      point = d.site_xpos[object_id]
      rot = d.site_xmat[object_id]
    else:
      raise ValueError(
          f'object_velocity supports body/geom/site, got {object_type!r}')
    ang, lin = sensor_ops._object_velocity(m, d, point, bodyid)
    if local_frame:
      ang, lin = rot.T @ ang, rot.T @ lin
    return np.stack([np.asarray(jax.device_get(lin)),
                     np.asarray(jax.device_get(ang))])

  def contact_force(self, contact_id: int):
    """Wrench of solved contact `contact_id` as a 2x3 array of
    (force, torque) in the contact frame (normal, tangent, tangent) —
    reference dm_control/mujoco/wrapper/core.py:527-552. The solver
    here supports frictional condim<=3 cones, so the torque row is
    zero (no torsional/rolling friction rows yet)."""
    con = self.data.contact
    active = np.asarray(jax.device_get(con.active))
    n_slots = active.shape[0]
    if not 0 <= contact_id < n_slots:
      raise ValueError(
          f'contact_id must be in [0, {n_slots}), got {contact_id}')
    force = np.asarray(jax.device_get(con.force[contact_id]))
    wrench = np.zeros((2, 3))
    if active[contact_id]:
      wrench[0] = force
    return wrench


class Camera:
  """A render viewpoint bound to one model camera (or the free camera).

  API-parity counterpart of reference dm_control/mujoco/engine.py:642-
  1000 over the on-device ray-caster: width/height properties,
  `render()` with the same output contracts, `matrices()`/`matrix`
  (engine.py:759-808), and ray-cast `select()` picking (engine.py:948-
  1000, minus flex/skin which this engine does not model).
  """

  def __init__(self, physics: Physics, height: int = 240,
               width: int = 320, camera_id=-1, max_geom=None,
               scene_callback=None):
    del max_geom, scene_callback  # no mjvScene geom budget here
    model = physics.model
    if isinstance(camera_id, str):
      camera_id = model.names.name2id('camera', camera_id)
    if camera_id < -1:
      raise ValueError('camera_id cannot be smaller than -1.')
    if camera_id >= model.ncam:
      raise ValueError(
          f'model has {model.ncam} fixed cameras; camera_id='
          f'{camera_id} is out of range.')
    self._physics = physics
    self._height = height
    self._width = width
    self._camera_id = camera_id

  @property
  def width(self):
    return self._width

  @property
  def height(self):
    return self._height

  def _pose_and_fov(self):
    """(cam_pos, cam_mat, fovy) for the current physics state."""
    from dm_control_tpu.render import rasterizer
    m, d = self._physics.model, self._physics.data
    pos, mat = rasterizer.camera_pose(m, d, self._camera_id)
    fovy = (float(np.asarray(m.cam_fovy)[self._camera_id])
            if self._camera_id >= 0 else 45.0)
    return pos, mat, fovy

  def matrices(self) -> CameraMatrices:
    """Image/focal/rotation/translation components of the camera
    matrix, matching reference engine.py:759-808."""
    pos, mat, fovy = self._pose_and_fov()
    pos = np.asarray(jax.device_get(pos))
    mat = np.asarray(jax.device_get(mat))
    # camera axes are mat's columns; world->camera rotation = mat^T
    rotation = np.eye(4)
    rotation[0:3, 0:3] = mat.T
    translation = np.eye(4)
    translation[0:3, 3] = -pos
    focal_scaling = (1.0 / np.tan(np.deg2rad(fovy) / 2)
                     ) * self._height / 2.0
    focal = np.diag([-focal_scaling, focal_scaling, 1.0, 0.0])[0:3, :]
    image = np.eye(3)
    image[0, 2] = (self._width - 1) / 2.0
    image[1, 2] = (self._height - 1) / 2.0
    return CameraMatrices(image=image, focal=focal, rotation=rotation,
                          translation=translation)

  @property
  def matrix(self):
    """The 3x4 camera (projection) matrix."""
    image, focal, rotation, translation = self.matrices()
    return image @ focal @ rotation @ translation

  def update(self, scene_option=None):
    """Refreshes derived geometry (FK) for rendering."""
    del scene_option
    physics = self._physics
    if physics._dirty_fields or physics._model_dirty:
      physics.forward()

  def render(self, overlays=(), depth: bool = False,
             segmentation: bool = False, scene_option=None,
             render_flag_overrides=None):
    """Renders this camera's view; contracts as reference
    engine.py:840-946."""
    from dm_control_tpu.render import rasterizer
    if overlays and (depth or segmentation):
      raise ValueError(
          'overlays are not supported with depth or segmentation '
          'rendering.')
    if render_flag_overrides and (depth or segmentation):
      raise ValueError(
          'render_flag_overrides are not supported with depth or '
          'segmentation rendering.')
    if depth and segmentation:
      raise ValueError(
          'depth and segmentation cannot both be enabled.')
    if overlays:
      raise NotImplementedError(
          'text overlays require the GL text pipeline, which the '
          'TPU ray-caster does not implement; composite overlays '
          'host-side instead.')
    if scene_option is not None or render_flag_overrides:
      raise NotImplementedError(
          'mjvOption scene flags are not supported by the TPU '
          'ray-caster; pass scene_option=None.')
    self.update()
    pos, mat, fovy = self._pose_and_fov()
    out = rasterizer.render(
        self._physics.model, self._physics.data, height=self._height,
        width=self._width, camera_id=self._camera_id, depth=depth,
        segmentation=segmentation, cam_pos=pos, cam_mat=mat, fovy=fovy)
    return np.asarray(jax.device_get(out))

  def select(self, cursor_position):
    """Body/geom under a cursor position ((x, y) in [0,1]^2,
    (0,0) = bottom-left). Returns a Selected namedtuple."""
    from dm_control_tpu.render import rasterizer
    self.update()
    pos, mat, fovy = self._pose_and_fov()
    cx, cy = cursor_position
    tan_half = np.tan(np.deg2rad(fovy) / 2.0)
    aspect = self._width / self._height
    x_cam = (2.0 * cx - 1.0) * tan_half * aspect
    y_cam = (2.0 * cy - 1.0) * tan_half
    direction = np.asarray(jax.device_get(
        jnp.asarray(mat) @ jnp.array([x_cam, y_cam, -1.0])))
    m, d = self._physics.model, self._physics.data
    geom_id, t = rasterizer.raycast(m, d, pos, direction)
    if geom_id < 0:
      return Selected(body=None, geom=None, flex=None, skin=None,
                      world_position=None)
    direction = direction / np.linalg.norm(direction)
    world_pos = np.asarray(jax.device_get(pos)) + t * direction
    body_id = int(m.geom_bodyid[geom_id])
    return Selected(body=body_id, geom=geom_id, flex=None, skin=None,
                    world_position=world_pos)


class MovableCamera(Camera):
  """Free camera whose pose is set via (lookat, distance, azimuth,
  elevation) — reference engine.py:1003-1058."""

  def __init__(self, physics: Physics, height: int = 240,
               width: int = 320, max_geom=None, scene_callback=None):
    super().__init__(physics=physics, height=height, width=width,
                     camera_id=-1, max_geom=max_geom,
                     scene_callback=scene_callback)
    # mjv_defaultFreeCamera analogue: look at the scene's centroid
    # from 1.5 extents away, azimuth 90, elevation -45.
    d = physics.data
    m = physics.model
    if m.ngeom:
      centroid = np.asarray(jax.device_get(
          jnp.mean(d.geom_xpos, axis=0)))
      extent = float(np.max(np.asarray(m.geom_size))) * 4.0 + 1.0
    else:
      centroid, extent = np.zeros(3), 1.0
    self._lookat = centroid
    self._distance = 1.5 * extent
    self._azimuth = 90.0
    self._elevation = -45.0

  def _pose_and_fov(self):
    az = np.deg2rad(self._azimuth)
    el = np.deg2rad(self._elevation)
    forward = np.array([np.cos(el) * np.cos(az),
                        np.cos(el) * np.sin(az),
                        np.sin(el)])
    pos = self._lookat - self._distance * forward
    up0 = np.array([0.0, 0.0, 1.0])
    right = np.cross(forward, up0)
    norm = np.linalg.norm(right)
    right = (right / norm if norm > 1e-8
             else np.array([1.0, 0.0, 0.0]))
    up = np.cross(right, forward)
    mat = np.stack([right, up, -forward], axis=1)
    return jnp.asarray(pos), jnp.asarray(mat), 45.0

  def get_pose(self) -> Pose:
    return Pose(self._lookat.copy(), self._distance, self._azimuth,
                self._elevation)

  def set_pose(self, lookat, distance, azimuth, elevation) -> None:
    self._lookat = np.asarray(lookat, dtype=float).copy()
    self._distance = float(distance)
    self._azimuth = float(azimuth)
    self._elevation = float(elevation)


class TextOverlay:
  """Host-side text overlay descriptor (reference engine.py:1061-1090).

  The TPU ray-caster produces raw pixels with no text pipeline, so this
  carries the title/body/style/position for host-side compositing;
  passing it to Camera.render raises NotImplementedError by design.
  """

  __slots__ = ('title', 'body', 'style', 'position')

  _STYLES = ('normal', 'shadow', 'big')
  _POSITIONS = ('top left', 'top right', 'bottom left', 'bottom right')

  def __init__(self, title='', body='', style='normal',
               position='top left'):
    if style not in self._STYLES:
      raise ValueError(f'style must be one of {self._STYLES}')
    if position not in self._POSITIONS:
      raise ValueError(f'position must be one of {self._POSITIONS}')
    self.title = title
    self.body = body
    self.style = style
    self.position = position


def action_spec(physics: Physics):
  """BoundedArray spec for the actuators (engine.py:1093 parity)."""
  from dm_env import specs
  m = physics.model
  limited = np.array(m.actuator_ctrllimited, dtype=bool)
  rng = np.asarray(m.actuator_ctrlrange, dtype=np.float64)
  minima = np.where(limited, rng[:, 0], -np.inf)
  maxima = np.where(limited, rng[:, 1], np.inf)
  return specs.BoundedArray(shape=(m.nu,), dtype=np.float64,
                            minimum=minima, maximum=maxima)
