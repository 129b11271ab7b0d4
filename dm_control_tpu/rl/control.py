"""The canonical environment loop: dm_env.Environment over jitted physics.

Behavioural contract follows reference dm_control/rl/control.py:28-374
(reset/step, sub-stepping, time-limit vs task termination, flat obs,
spec inference) — re-designed so that the entire inner loop
(n_sub_steps of physics + observation + reward) is ONE jitted function
`(Data, action, key) -> (Data, obs, reward, discount)`; the host only
converts to numpy TimeSteps.
"""

from __future__ import annotations

import abc
import collections
import logging
from typing import Any, Callable, Dict, Optional

import dm_env
from dm_env import specs
import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.models import types
from dm_control_tpu.ops import forward as forward_ops

_log = logging.getLogger('dm_control_tpu.rl')

FLAT_OBSERVATION_KEY = 'observations'


class PhysicsError(RuntimeError):
  """Raised if the physics state becomes divergent (NaN / overflow)."""


class Task(abc.ABC):
  """A JAX-native task: all hooks are pure, traceable functions."""

  @abc.abstractmethod
  def initialize_episode(self, model: types.Model, data: types.Data,
                         rng: jax.Array) -> types.Data:
    """Returns episode-initial Data (pure; traced)."""

  @abc.abstractmethod
  def get_observation(self, model: types.Model,
                      data: types.Data) -> Dict[str, jax.Array]:
    """Returns an OrderedDict of observation arrays (traced)."""

  @abc.abstractmethod
  def get_reward(self, model: types.Model, data: types.Data) -> jax.Array:
    """Returns a scalar reward (traced)."""

  def get_termination(self, model: types.Model,
                      data: types.Data) -> Optional[jax.Array]:
    """Optional scalar bool: episode terminates with discount 0."""
    return None

  def randomize_model(self, model: types.Model,
                      rng: jax.Array) -> types.Model:
    """Per-episode model randomization (pure; traced). Default: none."""
    del rng
    return model

  def before_step(self, model: types.Model, data: types.Data,
                  action: jax.Array) -> types.Data:
    """Maps action into Data (default: writes ctrl)."""
    return data.replace(ctrl=jnp.asarray(action, dtype=data.qpos.dtype))

  def after_step(self, model: types.Model, data: types.Data) -> types.Data:
    return data

  def action_spec(self, model: types.Model) -> specs.BoundedArray:
    limited = np.array(model.actuator_ctrllimited, dtype=bool)
    rng = np.asarray(model.actuator_ctrlrange, dtype=np.float64)
    minima = np.where(limited, rng[:, 0], -np.inf)
    maxima = np.where(limited, rng[:, 1], np.inf)
    return specs.BoundedArray(
        shape=(model.nu,), dtype=np.float32, minimum=minima,
        maximum=maxima, name='\t'.join(
            model.names.names('actuator')) or None)

  def observation_spec(self, model: types.Model):
    """Inferred by Environment via a probe call; override to customize."""
    raise NotImplementedError


def compute_n_steps(control_timestep: float, physics_timestep: float,
                    tolerance: float = 1e-5) -> int:
  """Sub-steps per control step (reference rl/control.py:168-195).

  The tolerance is relative and loose enough for float32 model
  timesteps (e.g. 0.0025f vs 0.025).
  """
  if control_timestep < physics_timestep * (1 - tolerance):
    raise ValueError(
        f'Control timestep ({control_timestep}) cannot be smaller than '
        f'physics timestep ({physics_timestep}).')
  ratio = control_timestep / physics_timestep
  if abs(ratio - round(ratio)) > tolerance * round(ratio):
    raise ValueError('Control timestep must be an integer multiple of '
                     'physics timestep.')
  return int(round(ratio))


class Environment(dm_env.Environment):
  """dm_env.Environment over a (Model, Task) pair with a jitted core."""

  def __init__(self,
               model: types.Model,
               task: Task,
               time_limit: float = float('inf'),
               control_timestep: Optional[float] = None,
               n_sub_steps: Optional[int] = None,
               flat_observation: bool = False,
               seed: Optional[int] = None):
    self._model = model
    self._task = task
    self._flat_observation = flat_observation
    if n_sub_steps is not None and control_timestep is not None:
      raise ValueError('Both n_sub_steps and control_timestep were '
                       'supplied.')
    ts = float(model.opt.timestep)
    if control_timestep is not None:
      self._n_sub_steps = compute_n_steps(control_timestep, ts)
    elif n_sub_steps is not None:
      self._n_sub_steps = n_sub_steps
    else:
      self._n_sub_steps = 1

    if time_limit == float('inf'):
      self._step_limit = float('inf')
    else:
      self._step_limit = time_limit / (ts * self._n_sub_steps)
    self._step_count = 0
    self._reset_next_step = True

    self._key = jax.random.PRNGKey(
        np.random.SeedSequence(seed).generate_state(1)[0])
    self._data: Optional[types.Data] = None
    self._physics_view = None

    model_ = model
    task_ = task
    n_sub = self._n_sub_steps

    def _reset(key):
      km, ki = jax.random.split(key)
      model = task_.randomize_model(model_, km)
      data = types.make_data(model)
      data = task_.initialize_episode(model, data, ki)
      data = forward_ops.forward(model, data)
      obs = task_.get_observation(model, data)
      return model, data, obs

    def _step(model, data, action):
      # invariant: data enters and leaves position/velocity-fresh
      # (legacy_step split; see ops.forward.step_legacy)
      data = task_.before_step(model, data, action)
      def body(d, _):
        return forward_ops.step_legacy(model, d), ()
      data, _ = jax.lax.scan(body, data, None, length=n_sub)
      data = task_.after_step(model, data)
      obs = task_.get_observation(model, data)
      reward = task_.get_reward(model, data)
      term = task_.get_termination(model, data)
      if term is None:
        term = jnp.zeros((), dtype=bool)
      return data, obs, jnp.asarray(reward), term

    self._reset_fn = jax.jit(_reset)
    self._step_fn = jax.jit(_step)
    # commit the model to device once; per-step calls then pass device
    # arrays through with no host->device transfers
    self._model_current = jax.device_put(model)

  # ------------------------------------------------------------------
  @property
  def model(self) -> types.Model:
    return self._model

  @property
  def data(self) -> types.Data:
    return self._data

  @property
  def physics(self):
    """A `mujoco.Physics` view over this environment's live state.

    Reference parity: suite users read and write
    `env.physics.named.data.*` between steps (reference
    rl/control.py:206-272 exposes the physics the env was built with).
    Writes staged through the view are committed into the jitted
    loop's state at the next step()/reset(); state advanced by step()
    is visible through the view immediately.
    """
    from dm_control_tpu.mujoco import engine as engine_lib
    if self._data is None:
      self.reset()
    if self._physics_view is None:
      self._physics_view = engine_lib.Physics._from_parts(
          self._model, self._model_current, self._data)
    else:
      self._sync_view_from_env()
    return self._physics_view

  def _sync_view_from_env(self):
    v = self._physics_view
    if v is not None and v._data is not self._data:
      v._data = self._data
      v._host_cache.clear()
      v._dirty_fields.clear()
      v._model_dirty.clear()

  def _sync_env_from_view(self):
    v = self._physics_view
    if v is not None and (v._dirty_fields or v._model_dirty):
      v.forward()           # commit staged writes + refresh derived
      self._data = v._data
      self._model_current = v._model_dev

  @property
  def task(self) -> Task:
    return self._task

  def control_timestep(self) -> float:
    return float(self._model.opt.timestep) * self._n_sub_steps

  @property
  def n_sub_steps(self) -> int:
    """Physics steps per control step (reference rl/control.py:64-78)."""
    return self._n_sub_steps

  # ------------------------------------------------------------------
  def reset(self) -> dm_env.TimeStep:
    self._reset_next_step = False
    self._step_count = 0
    self._episode_count = getattr(self, '_episode_count', 0) + 1
    _log.debug('episode %d: reset (previous episode ran %d steps)',
               self._episode_count, self._step_count)
    self._key, sub = jax.random.split(self._key)
    self._model_current, self._data, obs = self._reset_fn(sub)
    self._sync_view_from_env()
    obs = self._host_obs(obs)
    return dm_env.TimeStep(
        step_type=dm_env.StepType.FIRST, reward=None, discount=None,
        observation=obs)

  def step(self, action) -> dm_env.TimeStep:
    if self._reset_next_step:
      return self.reset()
    self._sync_env_from_view()
    action = np.asarray(action)
    self._data, obs, reward, term = self._step_fn(
        self._model_current, self._data, action)
    self._sync_view_from_env()
    self._step_count += 1

    if bool(self._data.divergence):
      _log.warning('episode %d diverged at step %d (NaN/overflow in '
                   'qpos/qvel/qacc)', getattr(self, '_episode_count', 0),
                   self._step_count)
      raise PhysicsError(
          'Physics state has become divergent (NaN or overflow).')

    obs = self._host_obs(obs)
    reward = float(reward)
    episode_over = bool(term)
    hit_limit = self._step_count >= self._step_limit
    if episode_over:
      self._reset_next_step = True
      return dm_env.TimeStep(dm_env.StepType.LAST, reward, 0.0, obs)
    elif hit_limit:
      self._reset_next_step = True
      return dm_env.TimeStep(dm_env.StepType.LAST, reward, 1.0, obs)
    return dm_env.TimeStep(dm_env.StepType.MID, reward, 1.0, obs)

  # ------------------------------------------------------------------
  def render(self, height: int = 240, width: int = 320, camera_id=-1,
             depth: bool = False, segmentation: bool = False,
             **unused_kwargs):
    """Render the current state via the on-device ray-caster
    (replaces the reference's physics.render pixel path)."""
    from dm_control_tpu.render import rasterizer
    if isinstance(camera_id, str):
      camera_id = self._model.names.name2id('camera', camera_id)
    if self._data is None:
      self.reset()
    return np.asarray(rasterizer.render(
        self._model_current, self._data, height=height, width=width,
        camera_id=camera_id, depth=depth, segmentation=segmentation))

  # ------------------------------------------------------------------
  def action_spec(self) -> specs.BoundedArray:
    return self._task.action_spec(self._model)

  def observation_spec(self):
    try:
      return self._task.observation_spec(self._model)
    except NotImplementedError:
      # infer by probing (reference rl/control.py:197-204)
      key = jax.random.PRNGKey(0)
      _, _, obs = self._reset_fn(key)
      obs = self._host_obs(obs)
      return _spec_from_observation(obs)

  def _host_obs(self, obs):
    # NOTE: jax.device_get is much cheaper than per-array np.asarray
    obs = collections.OrderedDict(jax.device_get(obs))
    if self._flat_observation:
      obs = flatten_observation(obs)
    return obs


def _spec_from_observation(observation):
  result = collections.OrderedDict()
  for key, value in observation.items():
    result[key] = specs.Array(value.shape, value.dtype, name=key)
  return result


def flatten_observation(observation,
                        output_key: str = FLAT_OBSERVATION_KEY):
  """Flattens dict observations into a single 1-D vector."""
  if not isinstance(observation, collections.abc.MutableMapping):
    raise ValueError('Can only flatten dict-like observations.')
  keys = list(observation.keys())
  observation_arrays = [np.asarray(observation[k]).ravel() for k in keys]
  return collections.OrderedDict(
      [(output_key, np.concatenate(observation_arrays))])
