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

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu import models
from dm_control_tpu.models import types
from dm_control_tpu.mujoco import index as index_lib
from dm_control_tpu.ops import forward as forward_ops


class PhysicsError(RuntimeError):
  """Physics state is divergent (NaN / overflow)."""


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
  def from_xml_string(cls, xml_string, assets=None) -> 'Physics':
    return cls(models.from_xml_string(xml_string, assets=assets))

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
    from dm_control_tpu.render import rasterizer
    if isinstance(camera_id, str):
      camera_id = self.model.names.name2id('camera', camera_id)
    if self._dirty_fields or self._model_dirty:
      self.forward()   # staged writes -> fresh geom poses
    out = rasterizer.render(
        self.model, self.data, height=height, width=width,
        camera_id=camera_id, depth=depth, segmentation=segmentation)
    return np.asarray(out)


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
