"""Color-valued variations; always evaluate to RGBA arrays
(reference dm_control/composer/variation/colors.py:29-106)."""

from __future__ import annotations

import colorsys

import numpy as np

from dm_control_tpu.composer.variation import base
from dm_control_tpu.composer.variation.variation_values import evaluate


class RgbVariation(base.Variation):
  """Per-channel variations in RGB(+alpha) space."""

  def __init__(self, r, g, b, alpha=1.0):
    self._r, self._g, self._b, self._alpha = r, g, b, alpha

  def __call__(self, initial_value=None, current_value=None,
               random_state=None):
    channels = evaluate([self._r, self._g, self._b, self._alpha],
                        initial_value, current_value, random_state)
    return np.asarray(channels)

  def __eq__(self, other):
    return (isinstance(other, RgbVariation)
            and (self._r, self._g, self._b, self._alpha)
            == (other._r, other._g, other._b, other._alpha))

  def __repr__(self):
    return (f'RgbVariation(r={self._r}, g={self._g}, b={self._b}, '
            f'alpha={self._alpha})')


class HsvVariation(base.Variation):
  """Per-channel variations in HSV space, emitted as RGBA."""

  def __init__(self, h, s, v, alpha=1.0):
    self._h, self._s, self._v, self._alpha = h, s, v, alpha

  def __call__(self, initial_value=None, current_value=None,
               random_state=None):
    h, s, v, alpha = evaluate((self._h, self._s, self._v, self._alpha),
                              initial_value, current_value, random_state)
    r, g, b = colorsys.hsv_to_rgb(h, s, v)
    return np.array([r, g, b, alpha])

  def __eq__(self, other):
    return (isinstance(other, HsvVariation)
            and (self._h, self._s, self._v, self._alpha)
            == (other._h, other._s, other._v, other._alpha))

  def __repr__(self):
    return (f'HsvVariation(h={self._h}, s={self._s}, v={self._v}, '
            f'alpha={self._alpha})')


class GrayVariation(HsvVariation):
  """Gray-level (+alpha) variation emitted as RGBA."""

  def __init__(self, gray_level, alpha=1.0):
    super().__init__(h=0.0, s=0.0, v=gray_level, alpha=alpha)

  def __repr__(self):
    return f'GrayVariation(gray_level={self._v}, alpha={self._alpha})'
