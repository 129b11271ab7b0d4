"""Domain-randomization DSL (reference dm_control/composer/variation).

Variations are lazily-evaluated random expressions with operator
overloading: `distributions.Uniform(0, 1) * 2 + base`. Evaluation takes
(initial_value, current_value, random_state).
"""

from dm_control_tpu.composer.variation import colors
from dm_control_tpu.composer.variation import deterministic
from dm_control_tpu.composer.variation import distributions
from dm_control_tpu.composer.variation import math
from dm_control_tpu.composer.variation import noises
from dm_control_tpu.composer.variation import rotations
from dm_control_tpu.composer.variation.base import Variation
from dm_control_tpu.composer.variation.variation_broadcaster import (
    VariationBroadcaster)
from dm_control_tpu.composer.variation.variation_values import (
    evaluate)


class MJCFVariator:
  """Applies variations to mjcf element attributes per episode
  (reference composer/variation/__init__.py:136 contract)."""

  def __init__(self):
    self._variations = {}
    self._initial = {}

  def bind_attributes(self, element, **kwargs):
    for attr, variation in kwargs.items():
      self._variations[(element, attr)] = variation

  def apply_variations(self, random_state):
    for (element, attr), variation in self._variations.items():
      key = (element, attr)
      current = getattr(element, attr)
      if key not in self._initial:
        self._initial[key] = current
      value = evaluate(variation, self._initial[key], current,
                       random_state)
      setattr(element, attr, value)

  def reset_initial_values(self):
    self._initial.clear()


class PhysicsVariator:
  """Applies variations to bound physics attributes per episode."""

  def __init__(self):
    self._variations = {}
    self._initial = {}

  def bind_attributes(self, element, **kwargs):
    for attr, variation in kwargs.items():
      self._variations[(element, attr)] = variation

  def apply_variations(self, physics, random_state):
    for (element, attr), variation in self._variations.items():
      binding = physics.bind(element)
      key = (element, attr)
      current = getattr(binding, attr)
      if key not in self._initial:
        self._initial[key] = current
      value = evaluate(variation, self._initial[key], current,
                       random_state)
      setattr(binding, attr, value)
