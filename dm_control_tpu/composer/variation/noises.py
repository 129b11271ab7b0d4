"""Additive / multiplicative observation noise
(reference composer/variation/noises.py:23-87)."""

from __future__ import annotations

from dm_control_tpu.composer.variation import base
from dm_control_tpu.composer.variation.variation_values import evaluate


class Additive(base.Variation):

  def __init__(self, distribution, cumulative=False):
    self._distribution = distribution
    self._cumulative = cumulative

  def __call__(self, initial_value=None, current_value=None,
               random_state=None):
    amount = evaluate(self._distribution, initial_value, current_value,
                      random_state)
    base_value = current_value if self._cumulative else initial_value
    return base_value + amount


class Multiplicative(base.Variation):

  def __init__(self, distribution, cumulative=False):
    self._distribution = distribution
    self._cumulative = cumulative

  def __call__(self, initial_value=None, current_value=None,
               random_state=None):
    amount = evaluate(self._distribution, initial_value, current_value,
                      random_state)
    base_value = current_value if self._cumulative else initial_value
    return base_value * amount
