"""Vectorized auto-resetting environment batches.

This is the TPU-native replacement for "run N processes with N Physics
copies" (reference scaling model — see SURVEY.md §2.1): one Model, a
vmapped state batch, auto-reset masking inside the jitted step, and
device-resident rollouts via lax.scan. Multi-chip scale-out shards the
env axis over a jax Mesh (see dm_control_tpu.parallel.sharding).

Throughput design: the scan carry is the *slim* physics state
(`forward.SLIM_STATE_FIELDS`, ~300 B/env) rather than the full Data
pytree (~40 kB/env for humanoid) — scan carries round-trip HBM every
iteration, and every derived quantity is recomputed by the forward
pipeline anyway. Observations are produced by one position/velocity
refresh after the substep loop, which also preserves the reference's
legacy-step freshness contract (reference dm_control/mujoco/engine.py:
147-176: derived state is position/velocity-fresh after step()).
"""

from __future__ import annotations

from typing import Tuple

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
               seed: int = 0,
               mesh=None,
               axis_name: str = 'env'):
    """`mesh`: optional jax.sharding.Mesh — when given, the env batch
    axis is sharded over its `axis_name` axis and the model is
    replicated; XLA inserts the (ICI) collectives. The computation is
    numerically identical to the single-device vmap path (asserted by
    tests/test_sharding.py)."""
    self._mesh = mesh
    if mesh is not None:
      from jax.sharding import NamedSharding, PartitionSpec as P
      if batch_size % mesh.devices.size:
        raise ValueError('batch_size must divide the mesh size')
      self._env_sharding = NamedSharding(mesh, P(axis_name))
      self._rep_sharding = NamedSharding(mesh, P())
      self.model = jax.device_put(model, self._rep_sharding)
    else:
      self._env_sharding = self._rep_sharding = None
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
      """Initial slim state + first fresh Data for one env."""
      data = types.make_data(model)
      data = task_.initialize_episode(model, data, key)
      data = forward_ops.forward(model, data)
      return data

    def _reset(model, key):
      keys = jax.random.split(key, batch_size)
      data = jax.vmap(lambda k: _init_one(model, k))(keys)
      obs = jax.vmap(lambda d: task_.get_observation(model, d))(data)
      state = forward_ops.slim_state(data)
      steps = jnp.zeros(batch_size, dtype=jnp.int32)
      return state, obs, steps

    def _inflate_b(model, state):
      return jax.vmap(lambda s: forward_ops.inflate(model, s))(state)

    def _step_core(model, state, actions):
      """One control step for the whole batch.

      The env axis stays EXPLICIT through the physics step so the
      Newton/Euler SPD solves run as single Pallas kernels over the
      batch (forward_ops.step_batched) instead of vmapped per-env
      unrolled solves.
      """
      D = _inflate_b(model, state)
      D = jax.vmap(lambda d, a: task_.before_step(model, d, a))(
          D, actions)
      state = forward_ops.slim_state(D)

      def body(s, _):
        Di = forward_ops.step_batched(model, _inflate_b(model, s),
                                      compute_sensors=False)
        return forward_ops.slim_state(Di), ()

      state, _ = jax.lax.scan(body, state, None, length=n_sub)
      # position/velocity refresh for observations (legacy-step contract)
      D = _inflate_b(model, state)
      # factor=False: observations never solve against M, so the qLD
      # inverse factor would be dead per-env work here
      D = jax.vmap(
          lambda d: forward_ops.fwd_pv(model, d, factor=False))(D)
      D = jax.vmap(lambda d: task_.after_step(model, d))(D)
      obs = jax.vmap(lambda d: task_.get_observation(model, d))(D)
      reward = jax.vmap(lambda d: task_.get_reward(model, d))(D)

      def _term_one(d):
        t = task_.get_termination(model, d)
        return jnp.zeros((), dtype=bool) if t is None else t

      term = jax.vmap(_term_one)(D)
      return forward_ops.slim_state(D), obs, reward, term, D.divergence

    def _step(model, state, steps, action, key):
      state, obs, reward, term, diverged = _step_core(
          model, state, action)
      steps = steps + 1
      done = term | (steps >= step_limit) | diverged
      # auto-reset done envs (cheap state reinit; next forward recomputes)
      keys = jax.random.split(key, batch_size)
      fresh = jax.vmap(lambda k: _init_one(model, k))(keys)
      fresh_state = forward_ops.slim_state(fresh)
      state = jax.tree.map(
          lambda new, old: jnp.where(
              done.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
          fresh_state, state)
      obs_fresh = jax.vmap(
          lambda d: task_.get_observation(model, d))(fresh)
      obs = jax.tree.map(
          lambda new, old: jnp.where(
              done.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
          obs_fresh, obs)
      steps = jnp.where(done, 0, steps)
      return state, obs, steps, reward, done

    if mesh is not None:
      env_s, rep_s = self._env_sharding, self._rep_sharding
      self._reset_fn = jax.jit(
          _reset, out_shardings=(env_s, env_s, env_s))
      self._step_fn = jax.jit(
          _step, donate_argnums=(1,),
          in_shardings=(rep_s, env_s, env_s, env_s, rep_s),
          out_shardings=(env_s, env_s, env_s, env_s, env_s))
    else:
      self._reset_fn = jax.jit(_reset)
      self._step_fn = jax.jit(_step, donate_argnums=(1,))
    self._step_core = _step_core
    self._init_one = _init_one
    self._state = None
    self._steps = None
    self._rollout_fn = None   # memoized: jit caches by fn identity
    self._data_fn = None

  # ------------------------------------------------------------------
  @property
  def _data(self) -> types.Data:
    """Full (position/velocity-fresh) Data batch for the current state."""
    if self._state is None:
      return None
    if self._data_fn is None:
      m = self.model
      self._data_fn = jax.jit(jax.vmap(
          lambda s: forward_ops.fwd_pv(m, forward_ops.inflate(m, s))))
    return self._data_fn(self._state)

  def reset(self):
    self._key, sub = jax.random.split(self._key)
    self._state, obs, self._steps = self._reset_fn(self.model, sub)
    return obs

  def step(self, actions):
    self._key, sub = jax.random.split(self._key)
    self._state, obs, self._steps, reward, done = self._step_fn(
        self.model, self._state, self._steps, actions, sub)
    return obs, reward, done

  # ------------------------------------------------------------------
  def rollout_random(self, n_steps: int,
                     unroll: int = 1) -> Tuple[types.Data, jax.Array]:
    """Device-resident rollout with uniform-random actions.

    Returns (final Data batch, summed rewards (batch,)). The entire
    rollout is one lax.scan over the slim state — the benchmark path.
    """
    model = self.model
    batch = self.batch_size
    nu = model.nu
    lo = np.where(np.array(model.actuator_ctrllimited, dtype=bool),
                  np.asarray(model.actuator_ctrlrange)[:, 0], -1.0)
    hi = np.where(np.array(model.actuator_ctrllimited, dtype=bool),
                  np.asarray(model.actuator_ctrlrange)[:, 1], 1.0)
    step_core = self._step_core

    def run(state, key, n):
      pool = state   # reset pool: each env's own initial state

      def body(carry, _):
        state, key, total = carry
        key, ka = jax.random.split(key)
        actions = jax.random.uniform(
            ka, (batch, nu), minval=lo, maxval=hi,
            dtype=jnp.float32)
        state, _, reward, term, diverged = step_core(
            model, state, actions)
        # auto-reset finished/diverged envs to their pooled initial
        # state (a NaN env would otherwise persist for the whole
        # rollout and pin the solver at max iterations every step)
        done = term | diverged
        state = jax.tree.map(
            lambda pool_x, x: jnp.where(
                done.reshape((-1,) + (1,) * (x.ndim - 1)), pool_x, x),
            pool, state)
        # a diverged env's reward is NaN this step; don't poison total
        reward = jnp.where(diverged, 0.0, reward)
        return (state, key, total + reward), ()

      (state, _, total), _ = jax.lax.scan(
          body, (state, key, jnp.zeros(batch, dtype=jnp.float32)),
          None, length=n, unroll=unroll)
      return state, total

    if self._state is None:
      self.reset()
    self._key, sub = jax.random.split(self._key)
    if self._rollout_fn is None:
      if self._mesh is not None:
        self._rollout_fn = jax.jit(
            run, static_argnums=2,
            in_shardings=(self._env_sharding, self._rep_sharding),
            out_shardings=(self._env_sharding, self._env_sharding))
      else:
        self._rollout_fn = jax.jit(run, static_argnums=2)
    state, total = self._rollout_fn(self._state, sub, n_steps)
    self._state = state
    return self._data, total
