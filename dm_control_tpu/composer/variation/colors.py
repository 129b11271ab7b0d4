"""Color variations, always emitting RGBA (contract: reference
composer/variation/colors.py). Factories over the Expr core."""

import colorsys

import numpy as np

from dm_control_tpu.composer.variation import _expr


def _rgba_node(channels, to_rgb, label):
  def run(ctx):
    *color, alpha = [_expr.resolve(c, ctx) for c in channels]
    return np.array([*to_rgb(*color), alpha], dtype=float)
  return _expr.Expr(run, label=label)


def RgbVariation(r, g, b, alpha=1.0):  # noqa: N802
  """Per-channel variation in RGB space."""
  return _rgba_node((r, g, b, alpha), lambda *c: c, 'rgb')


def HsvVariation(h, s, v, alpha=1.0):  # noqa: N802
  """Per-channel variation in HSV space."""
  return _rgba_node((h, s, v, alpha), colorsys.hsv_to_rgb, 'hsv')


def GrayVariation(gray_level, alpha=1.0):  # noqa: N802
  """Gray level (+alpha) variation."""
  return _rgba_node((0.0, 0.0, gray_level, alpha), colorsys.hsv_to_rgb,
                    'gray')
