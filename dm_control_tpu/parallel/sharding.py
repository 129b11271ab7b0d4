"""Multi-chip scale-out: shard the env batch over a device mesh.

Environments are embarrassingly parallel, so the natural mesh for this
workload is a single 'env' (data) axis over ICI; collectives appear only
for metric reduction (psum) and trajectory gather. This module provides
the mesh plumbing used by the driver dryrun and the benchmark harness.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dm_control_tpu.models import types


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = 'env', devices=None) -> Mesh:
  devs = list(devices) if devices is not None else jax.devices()
  if n_devices is not None:
    devs = devs[:n_devices]
  return Mesh(np.array(devs), (axis_name,))


def shard_batch(mesh: Mesh, tree, axis_name: str = 'env'):
  """Places a batched pytree with the leading axis sharded over mesh."""
  sharding = NamedSharding(mesh, P(axis_name))
  return jax.tree.map(
      lambda x: jax.device_put(x, sharding)
      if hasattr(x, 'ndim') and x.ndim >= 1 else x, tree)


def replicate(mesh: Mesh, tree):
  sharding = NamedSharding(mesh, P())
  return jax.device_put(tree, sharding)


def sharded_train_step(mesh: Mesh, model: types.Model, task,
                       n_sub_steps: int = 1, axis_name: str = 'env'):
  """Builds a jitted sharded step: (data, actions) -> (data, metrics).

  The env batch axis is sharded over the mesh; the returned mean reward
  is a cross-chip psum-style reduction (XLA inserts the collective from
  the sharding annotations).
  """
  from dm_control_tpu.ops import forward as forward_ops

  data_sharding = NamedSharding(mesh, P(axis_name))
  scalar_sharding = NamedSharding(mesh, P())

  def step_one(d, a):
    d = task.before_step(model, d, a)
    def body(dd, _):
      return forward_ops.step_legacy(model, dd), ()
    d, _ = jax.lax.scan(body, d, None, length=n_sub_steps)
    r = task.get_reward(model, d)
    return d, r

  def train_step(data, actions):
    data, rewards = jax.vmap(step_one)(data, actions)
    # cross-device reduction rides ICI (psum inserted by XLA)
    metrics = {
        'mean_reward': jnp.mean(rewards),
        'diverged': jnp.sum(data.divergence.astype(jnp.int32)),
    }
    return data, metrics

  return jax.jit(
      train_step,
      in_shardings=(data_sharding, data_sharding),
      out_shardings=(data_sharding, scalar_sharding))
