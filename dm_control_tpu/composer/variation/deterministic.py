"""Non-random variations (reference
dm_control/composer/variation/deterministic.py:23-70)."""

from __future__ import annotations

from dm_control_tpu.composer.variation import base
from dm_control_tpu.composer.variation.variation_values import evaluate


class Constant(base.Variation):
  """Always evaluates to a fixed value (useful in tests)."""

  def __init__(self, value):
    self._value = value

  def __call__(self, initial_value=None, current_value=None,
               random_state=None):
    return self._value

  def __eq__(self, other):
    return isinstance(other, Constant) and self._value == other._value

  def __str__(self):
    return f'{self._value}'

  def __repr__(self):
    return f'Constant({self._value!r})'


class Sequence(base.Variation):
  """Cycles through a fixed sequence of values, one per evaluation."""

  def __init__(self, values):
    self._values = values
    self._iterator = iter(self._values)

  def __call__(self, initial_value=None, current_value=None,
               random_state=None):
    try:
      value = next(self._iterator)
    except StopIteration:
      self._iterator = iter(self._values)
      value = next(self._iterator)
    return evaluate(value, initial_value=initial_value,
                    current_value=current_value,
                    random_state=random_state)


class Identity(base.Variation):
  """Evaluates to the current value unchanged."""

  def __call__(self, initial_value=None, current_value=None,
               random_state=None):
    return current_value

  def __eq__(self, other):
    return isinstance(other, Identity)
