# Spec constants in this file reproduce task-specification values from
# dm_control (github.com/google-deepmind/dm_control), Copyright The
# dm_control Authors, Apache License 2.0.
"""Soft indicator ("tolerance") reward functions, jnp-native.

Behavioral contract: reference dm_control/utils/rewards.py — the same
sigmoid family, bounds semantics, and value_at_margin calibration. The
formulas ARE the benchmark spec; here they live in one table mapping
sigmoid name -> (calibration, curve) so rewards trace into a jitted
step. Works with numpy inputs too (returns jnp arrays).
"""

from __future__ import annotations

import jax.core
import jax.numpy as jnp
import numpy as np

_DEFAULT_VALUE_AT_MARGIN = 0.1

# Each sigmoid is (calibrate, curve):
#   calibrate(v1) -> scale such that curve(1 * scale) == v1
#   curve(sx)     -> reward value for scaled distance sx >= 0
# "Windowed" entries clip to exactly zero beyond |sx| >= 1.
_SMOOTH_SIGMOIDS = {
    'gaussian': (
        lambda v1: np.sqrt(-2 * np.log(v1)),
        lambda sx: jnp.exp(-0.5 * sx * sx)),
    'hyperbolic': (
        lambda v1: np.arccosh(1 / v1),
        lambda sx: 1 / jnp.cosh(sx)),
    'long_tail': (
        lambda v1: np.sqrt(1 / v1 - 1),
        lambda sx: 1 / (sx * sx + 1)),
    'reciprocal': (
        lambda v1: 1 / v1 - 1,
        lambda sx: 1 / (jnp.abs(sx) + 1)),
    'tanh_squared': (
        lambda v1: np.arctanh(np.sqrt(1 - v1)),
        lambda sx: 1 - jnp.tanh(sx) ** 2),
}

_WINDOWED_SIGMOIDS = {
    'cosine': (
        lambda v1: np.arccos(2 * v1 - 1) / np.pi,
        lambda sx: (1 + jnp.cos(np.pi * sx)) / 2),
    'linear': (
        lambda v1: 1 - v1,
        lambda sx: 1 - sx),
    'quadratic': (
        lambda v1: np.sqrt(1 - v1),
        lambda sx: 1 - sx * sx),
}


def _shaping_fn(sigmoid, value_at_margin):
  """Returns curve(distance_in_margins) for the named sigmoid."""
  if sigmoid in _WINDOWED_SIGMOIDS:
    if not 0 <= value_at_margin < 1:
      raise ValueError(
          f'value_at_margin for {sigmoid!r} must lie in [0, 1); '
          f'got {value_at_margin}.')
    calibrate, curve = _WINDOWED_SIGMOIDS[sigmoid]
    scale = calibrate(value_at_margin)
    return lambda x: jnp.where(
        jnp.abs(x * scale) < 1, curve(x * scale), 0.0)
  if sigmoid in _SMOOTH_SIGMOIDS:
    if not 0 < value_at_margin < 1:
      raise ValueError(
          f'value_at_margin for {sigmoid!r} must lie in (0, 1); '
          f'got {value_at_margin}.')
    calibrate, curve = _SMOOTH_SIGMOIDS[sigmoid]
    scale = calibrate(value_at_margin)
    return lambda x: curve(x * scale)
  raise ValueError(
      f'Unknown sigmoid {sigmoid!r}; choose from '
      f'{sorted(_SMOOTH_SIGMOIDS) + sorted(_WINDOWED_SIGMOIDS)}.')


def _sigmoids(x, value_at_1, sigmoid):
  """Maps scaled distance x >= 0 to a value in [0, 1]."""
  return _shaping_fn(sigmoid, value_at_1)(x)


def _is_traced(value):
  return isinstance(value, jax.core.Tracer)


def tolerance(x, bounds=(0.0, 0.0), margin=0.0, sigmoid='gaussian',
              value_at_margin=_DEFAULT_VALUE_AT_MARGIN):
  """Soft indicator: 1 inside `bounds`, decaying over `margin` outside."""
  lower, upper = bounds
  if (not _is_traced(lower) and not _is_traced(upper)
      and np.ndim(lower) == 0 and np.ndim(upper) == 0):
    try:
      if float(lower) > float(upper):
        raise ValueError(
            f'bounds must satisfy lower <= upper; got ({lower}, {upper}).')
    except TypeError:
      pass

  x = jnp.asarray(x)
  hit = jnp.logical_and(lower <= x, x <= upper)
  overshoot = jnp.where(x < lower, lower - x, x - upper)

  if _is_traced(margin):
    # Traced margin: branchless — divide by a floored margin and mask
    # the margin==0 case to a hard indicator.
    shaped = _shaping_fn(sigmoid, value_at_margin)(
        overshoot / jnp.maximum(margin, 1e-30))
    return jnp.where(hit, 1.0, jnp.where(margin > 0, shaped, 0.0))
  if margin < 0:
    raise ValueError(f'margin must be non-negative; got {margin}.')
  if margin == 0:
    return jnp.where(hit, 1.0, 0.0)
  shaped = _shaping_fn(sigmoid, value_at_margin)(overshoot / margin)
  return jnp.where(hit, 1.0, shaped)
