"""Domain-randomization DSL (contract: reference
dm_control/composer/variation).

Variations are lazily-evaluated random expressions — see `_expr` for the
functional core. `distributions.Uniform(0, 1) * 2 + base` builds an
expression graph; calling it with (initial_value, current_value,
random_state) evaluates it.
"""

from dm_control_tpu.composer.variation import colors
from dm_control_tpu.composer.variation import deterministic
from dm_control_tpu.composer.variation import distributions
from dm_control_tpu.composer.variation import math
from dm_control_tpu.composer.variation import noises
from dm_control_tpu.composer.variation import rotations
from dm_control_tpu.composer.variation._expr import evaluate
from dm_control_tpu.composer.variation._expr import Expr
from dm_control_tpu.composer.variation._expr import Variation
from dm_control_tpu.composer.variation.variation_broadcaster import (
    VariationBroadcaster)


class _AttributeVariator:
  """Shared engine for the MJCF/Physics variators.

  Tracks (target, attribute) -> variation bindings plus the first value
  seen per binding (the "initial" value fed to the expression graph).
  Subclasses say how a bound element maps to the object whose attribute
  is read/written.
  """

  def __init__(self):
    self._bound = {}
    self._episode_start = {}

  def bind_attributes(self, element, **variations_by_attr):
    for attr, expr in variations_by_attr.items():
      self._bound[(element, attr)] = expr

  def reset_initial_values(self):
    self._episode_start.clear()

  def _apply_all(self, random_state, target_of):
    for (element, attr), expr in self._bound.items():
      obj = target_of(element)
      live = getattr(obj, attr)
      start = self._episode_start.setdefault((element, attr), live)
      setattr(obj, attr, evaluate(expr, start, live, random_state))


class MJCFVariator(_AttributeVariator):
  """Varies mjcf element attributes each episode (pre-compile)."""

  def apply_variations(self, random_state):
    self._apply_all(random_state, lambda element: element)


class PhysicsVariator(_AttributeVariator):
  """Varies bound physics attributes each episode (post-compile)."""

  def apply_variations(self, physics, random_state):
    self._apply_all(random_state, physics.bind)
