"""Base class and helpers for suite tasks.

Counterpart of reference dm_control/suite/base.py — but tasks here are
pure-functional: observation/reward/initialization are jnp expressions
traced into the environment's single jitted step.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from dm_control_tpu.models import types
from dm_control_tpu.rl import control


class Task(control.Task):
  """Suite task base: keeps the model around for index lookups."""

  def __init__(self, model: types.Model):
    self._model = model
    self.visualize_reward = False

  @property
  def model(self) -> types.Model:
    return self._model

  # -------- name-based index helpers (resolved at trace time) --------
  def body_id(self, name: str) -> int:
    return self._model.names.name2id('body', name)

  def joint_qposadr(self, name: str) -> int:
    j = self._model.names.name2id('joint', name)
    return self._model.jnt_qposadr[j]

  def joint_dofadr(self, name: str) -> int:
    j = self._model.names.name2id('joint', name)
    return self._model.jnt_dofadr[j]

  def geom_id(self, name: str) -> int:
    return self._model.names.name2id('geom', name)

  def site_id(self, name: str) -> int:
    return self._model.names.name2id('site', name)

  def sensor_slice(self, name: str) -> slice:
    s = self._model.names.name2id('sensor', name)
    adr = self._model.sensor_adr[s]
    return slice(adr, adr + self._model.sensor_dim[s])


def randn(key, shape=(), dtype=jnp.float32):
  return jax.random.normal(key, shape, dtype=dtype)


def uniform(key, shape=(), lo=0.0, hi=1.0, dtype=jnp.float32):
  return jax.random.uniform(key, shape, dtype=dtype, minval=lo, maxval=hi)


def random_limited_qpos(model: types.Model, key) -> jax.Array:
  """Random positions for limited joints, uniform within ranges.

  Behavioural counterpart of
  reference dm_control/suite/utils/randomizers.py:35-89 for the
  hinge/slide cases (ball/free randomization added with those tasks).
  """
  qpos = model.qpos0
  keys = jax.random.split(key, max(model.njnt, 1))
  for j in range(model.njnt):
    if not model.jnt_limited[j]:
      continue
    adr = model.jnt_qposadr[j]
    lo = model.jnt_range[j, 0]
    hi = model.jnt_range[j, 1]
    val = jax.random.uniform(keys[j], (), minval=lo, maxval=hi,
                             dtype=qpos.dtype)
    qpos = qpos.at[adr].set(val)
  return qpos
