"""Vectorized auto-resetting environment batches.

This is the TPU-native replacement for "run N processes with N Physics
copies" (reference scaling model — see SURVEY.md §2.1): one Model, a
vmapped Data batch, auto-reset masking inside the jitted step, and
device-resident rollouts via lax.scan. Multi-chip scale-out shards the
env axis over a jax Mesh (see dm_control_tpu.parallel.sharding).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.models import types
from dm_control_tpu.ops import forward as forward_ops
from dm_control_tpu.rl import control


class BatchedEnvironment:
  """A batch of identical environments stepped as one jitted function.

  Auto-reset semantics: when an episode ends (task termination, time
  limit, or physics divergence) the env's state is re-initialized in
  the same step; the returned observation for that env is the *initial*
  observation of the new episode, and `done` is flagged.
  """

  def __init__(self, model: types.Model, task: control.Task,
               batch_size: int,
               time_limit: float = float('inf'),
               n_sub_steps: int = 1,
               seed: int = 0):
    self.model = jax.device_put(model)
    self.task = task
    self.batch_size = batch_size
    self._n_sub_steps = n_sub_steps
    ts = float(model.opt.timestep)
    if time_limit == float('inf'):
      self._step_limit = np.iinfo(np.int32).max
    else:
      self._step_limit = int(round(time_limit / (ts * n_sub_steps)))
    self._key = jax.random.PRNGKey(seed)

    task_ = task
    n_sub = n_sub_steps
    step_limit = self._step_limit

    def _init_one(model, key):
      data = types.make_data(model)
      data = task_.initialize_episode(model, data, key)
      return forward_ops.forward(model, data)

    def _reset(model, key):
      keys = jax.random.split(key, batch_size)
      data = jax.vmap(lambda k: _init_one(model, k))(keys)
      obs = jax.vmap(lambda d: task_.get_observation(model, d))(data)
      steps = jnp.zeros(batch_size, dtype=jnp.int32)
      return data, obs, steps

    def _step_one(model, data, action):
      # data enters and leaves position/velocity-fresh (legacy_step)
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
      return data, obs, reward, term

    def _step(model, data, steps, action, key):
      data, obs, reward, term = jax.vmap(
          lambda d, a: _step_one(model, d, a))(data, action)
      steps = steps + 1
      done = term | (steps >= step_limit) | data.divergence
      # auto-reset done envs (cheap state reinit; next forward recomputes)
      keys = jax.random.split(key, batch_size)
      fresh = jax.vmap(lambda k: _init_one(model, k))(keys)
      data = jax.tree.map(
          lambda new, old: jnp.where(
              done.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
          fresh, data)
      obs_fresh = jax.vmap(
          lambda d: task_.get_observation(model, d))(fresh)
      obs = jax.tree.map(
          lambda new, old: jnp.where(
              done.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
          obs_fresh, obs)
      steps = jnp.where(done, 0, steps)
      return data, obs, steps, reward, done

    self._reset_fn = jax.jit(_reset)
    self._step_fn = jax.jit(_step)
    self._step_one = _step_one
    self._init_one = _init_one
    self._data = None
    self._steps = None

  # ------------------------------------------------------------------
  def reset(self):
    self._key, sub = jax.random.split(self._key)
    self._data, obs, self._steps = self._reset_fn(self.model, sub)
    return obs

  def step(self, actions):
    self._key, sub = jax.random.split(self._key)
    self._data, obs, self._steps, reward, done = self._step_fn(
        self.model, self._data, self._steps, actions, sub)
    return obs, reward, done

  # ------------------------------------------------------------------
  def rollout_random(self, n_steps: int,
                     unroll: int = 1) -> Tuple[types.Data, jax.Array]:
    """Device-resident rollout with uniform-random actions.

    Returns (final Data batch, summed rewards (batch,)). The entire
    rollout is one lax.scan — this is the benchmark path.
    """
    model = self.model
    task_ = self.task
    batch = self.batch_size
    nu = model.nu
    lo = np.where(np.array(model.actuator_ctrllimited, dtype=bool),
                  np.asarray(model.actuator_ctrlrange)[:, 0], -1.0)
    hi = np.where(np.array(model.actuator_ctrllimited, dtype=bool),
                  np.asarray(model.actuator_ctrlrange)[:, 1], 1.0)
    step_one = self._step_one

    def body(carry, _):
      data, key, total = carry
      key, ka = jax.random.split(key)
      actions = jax.random.uniform(
          ka, (batch, nu), minval=lo, maxval=hi,
          dtype=jnp.float32)
      data, _, reward, _ = jax.vmap(
          lambda d, a: step_one(model, d, a))(data, actions)
      return (data, key, total + reward), ()

    def run(data, key, n):
      (data, _, total), _ = jax.lax.scan(
          body, (data, key, jnp.zeros(batch, dtype=jnp.float32)),
          None, length=n, unroll=unroll)
      return data, total

    if self._data is None:
      self.reset()
    self._key, sub = jax.random.split(self._key)
    run_jit = jax.jit(run, static_argnums=2)
    return run_jit(self._data, sub, n_steps)
