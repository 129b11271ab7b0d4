"""Variation evaluation helper."""

from dm_control_tpu.composer.variation import base


def evaluate(value, initial_value=None, current_value=None,
             random_state=None):
  if isinstance(value, base.Variation):
    return value(initial_value, current_value, random_state)
  return value
