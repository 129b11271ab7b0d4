"""Nested-structure evaluation (contract: reference
composer/variation/variation_values.py). Implementation in `_expr`."""

from dm_control_tpu.composer.variation._expr import evaluate

__all__ = ['evaluate']
