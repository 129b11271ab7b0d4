"""Soft indicator ("tolerance") reward functions, jnp-native.

Behavioural contract follows reference dm_control/utils/rewards.py:25-136
(same sigmoid family, bounds semantics and value_at_margin calibration),
re-derived here on jax.numpy so rewards trace into the jitted step. Works
with numpy inputs too (returns jnp arrays).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# default value of the sigmoid at margin distance
_DEFAULT_VALUE_AT_MARGIN = 0.1


def _sigmoids(x, value_at_1, sigmoid):
  """Maps distance x >= 0 (in margins) to a value in [0, 1]."""
  if sigmoid in ('cosine', 'linear', 'quadratic'):
    if not 0 <= value_at_1 < 1:
      raise ValueError(
          f'`value_at_1` must be nonnegative and smaller than 1, '
          f'got {value_at_1}.')
  else:
    if not 0 < value_at_1 < 1:
      raise ValueError(
          f'`value_at_1` must be strictly between 0 and 1, '
          f'got {value_at_1}.')

  if sigmoid == 'gaussian':
    scale = np.sqrt(-2 * np.log(value_at_1))
    return jnp.exp(-0.5 * (x * scale) ** 2)
  elif sigmoid == 'hyperbolic':
    scale = np.arccosh(1 / value_at_1)
    return 1 / jnp.cosh(x * scale)
  elif sigmoid == 'long_tail':
    scale = np.sqrt(1 / value_at_1 - 1)
    return 1 / ((x * scale) ** 2 + 1)
  elif sigmoid == 'reciprocal':
    scale = 1 / value_at_1 - 1
    return 1 / (jnp.abs(x) * scale + 1)
  elif sigmoid == 'cosine':
    scale = np.arccos(2 * value_at_1 - 1) / np.pi
    scaled_x = x * scale
    return jnp.where(jnp.abs(scaled_x) < 1,
                     (1 + jnp.cos(np.pi * scaled_x)) / 2, 0.0)
  elif sigmoid == 'linear':
    scale = 1 - value_at_1
    scaled_x = x * scale
    return jnp.where(jnp.abs(scaled_x) < 1, 1 - scaled_x, 0.0)
  elif sigmoid == 'quadratic':
    scale = np.sqrt(1 - value_at_1)
    scaled_x = x * scale
    return jnp.where(jnp.abs(scaled_x) < 1, 1 - scaled_x ** 2, 0.0)
  elif sigmoid == 'tanh_squared':
    scale = np.arctanh(np.sqrt(1 - value_at_1))
    return 1 - jnp.tanh(x * scale) ** 2
  else:
    raise ValueError(f'Unknown sigmoid type {sigmoid!r}.')


def tolerance(x, bounds=(0.0, 0.0), margin=0.0, sigmoid='gaussian',
              value_at_margin=_DEFAULT_VALUE_AT_MARGIN):
  """Soft indicator: 1 inside `bounds`, decaying over `margin` outside."""
  lower, upper = bounds
  # bounds/margin may be traced values inside jit; only validate when
  # they are concrete python/numpy scalars
  import jax.core
  concrete = not (isinstance(lower, jax.core.Tracer) or
                  isinstance(upper, jax.core.Tracer))
  if concrete and np.asarray(lower).ndim == 0 and np.asarray(
      upper).ndim == 0:
    try:
      if float(lower) > float(upper):
        raise ValueError('Lower bound must be <= upper bound.')
    except TypeError:
      pass
  if not isinstance(margin, jax.core.Tracer) and margin < 0:
    raise ValueError('`margin` must be non-negative.')

  x = jnp.asarray(x)
  in_bounds = jnp.logical_and(lower <= x, x <= upper)
  if isinstance(margin, jax.core.Tracer):
    # branchless path for traced margins
    d = (jnp.where(x < lower, lower - x, x - upper) /
         jnp.maximum(margin, 1e-30))
    value = jnp.where(
        in_bounds, 1.0,
        jnp.where(margin > 0, _sigmoids(d, value_at_margin, sigmoid),
                  0.0))
  elif margin == 0:
    value = jnp.where(in_bounds, 1.0, 0.0)
  else:
    d = jnp.where(x < lower, lower - x, x - upper) / margin
    value = jnp.where(in_bounds, 1.0,
                      _sigmoids(d, value_at_margin, sigmoid))
  return value
