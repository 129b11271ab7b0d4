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
  """Random positions for limited and rotational joints.

  Behavioural counterpart of reference
  dm_control/suite/utils/randomizers.py:35-89: limited hinge/slide
  joints uniform in range; unlimited hinges uniform in [-pi, pi);
  unlimited ball joints uniform on the unit 3-sphere; limited ball
  joints uniform on a sector (random axis, angle in [0, range_max]);
  free joints get a random unit quaternion from rand(4) (the
  reference keeps this rand-not-randn quirk "to avoid changing
  benchmark results", randomizers.py:84-89) and unrandomized linear
  slots.
  """
  import numpy as np
  from dm_control_tpu.models import constants
  qpos = jnp.asarray(model.qpos0)
  keys = jax.random.split(key, max(model.njnt, 1))
  for j in range(model.njnt):
    jt = model.jnt_type[j]
    adr = model.jnt_qposadr[j]
    limited = bool(model.jnt_limited[j])
    if jt == constants.JointType.HINGE:
      if limited:
        lo, hi = model.jnt_range[j, 0], model.jnt_range[j, 1]
      else:
        lo, hi = -np.pi, np.pi
      val = jax.random.uniform(keys[j], (), minval=lo, maxval=hi,
                               dtype=qpos.dtype)
      qpos = qpos.at[adr].set(val)
    elif jt == constants.JointType.SLIDE and limited:
      lo, hi = model.jnt_range[j, 0], model.jnt_range[j, 1]
      val = jax.random.uniform(keys[j], (), minval=lo, maxval=hi,
                               dtype=qpos.dtype)
      qpos = qpos.at[adr].set(val)
    elif jt == constants.JointType.BALL:
      if limited:
        q = _random_limited_quaternion(
            keys[j], model.jnt_range[j, 1], qpos.dtype)
      else:
        q = jax.random.normal(keys[j], (4,), dtype=qpos.dtype)
        q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
      qpos = qpos.at[adr:adr + 4].set(q)
    elif jt == constants.JointType.FREE:
      q = jax.random.uniform(keys[j], (4,), dtype=qpos.dtype)
      q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
      qpos = qpos.at[adr + 3:adr + 7].set(q)
  return qpos


def _random_limited_quaternion(key, limit, dtype):
  """Unit quaternion with rotation angle uniform in [0, limit].

  Counterpart of reference randomizers.random_limited_quaternion
  (suite/utils/randomizers.py:22-33): random axis, uniform angle.
  """
  kaxis, kangle = jax.random.split(key)
  axis = jax.random.normal(kaxis, (3,), dtype=dtype)
  axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-12)
  angle = jax.random.uniform(kangle, (), minval=0.0,
                             maxval=limit, dtype=dtype)
  half = 0.5 * angle
  return jnp.concatenate(
      [jnp.cos(half)[None], jnp.sin(half) * axis])


def random_limited_qpos_only_limited(model: types.Model, key) -> jax.Array:
  """Randomize only LIMITED joints within range (cheetah-style init)."""
  qpos = jnp.asarray(model.qpos0)
  keys = jax.random.split(key, max(model.njnt, 1))
  from dm_control_tpu.models import constants
  for j in range(model.njnt):
    if not model.jnt_limited[j]:
      continue
    jt = model.jnt_type[j]
    if jt not in (constants.JointType.HINGE, constants.JointType.SLIDE):
      continue
    adr = model.jnt_qposadr[j]
    val = jax.random.uniform(
        keys[j], (), minval=model.jnt_range[j, 0],
        maxval=model.jnt_range[j, 1], dtype=qpos.dtype)
    qpos = qpos.at[adr].set(val)
  return qpos
