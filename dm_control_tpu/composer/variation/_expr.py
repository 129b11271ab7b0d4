"""Expression-graph core of the variation DSL.

Behavioral contract: reference dm_control/composer/variation/* — a
Variation is a lazily-evaluated random expression called with
(initial_value, current_value, random_state). This implementation is a
single functional core: every variation is an `Expr` node wrapping an
evaluation closure over an immutable `Ctx`, and the whole arithmetic
surface is injected from one operator table rather than one class per
op. Public modules (deterministic, math, rotations, colors, noises,
distributions) are factory collections over this core.
"""

from __future__ import annotations

import operator
from typing import Any, Callable, NamedTuple

import numpy as np


class Ctx(NamedTuple):
  """Evaluation context threaded through an expression graph."""
  initial: Any
  current: Any
  rng: Any

  @property
  def random_state(self):
    return self.rng if self.rng is not None else np.random


def resolve(node, ctx: Ctx):
  """Evaluates `node` under `ctx`.

  Exprs (and any callable) are invoked; dicts / lists / tuples /
  namedtuples are traversed recursively; everything else passes through.
  """
  if isinstance(node, Expr):
    return node._fn(ctx)  # pylint: disable=protected-access
  if callable(node):
    return node(ctx.initial, ctx.current, ctx.rng)
  if isinstance(node, dict):
    return type(node)(
        (k, resolve(v, ctx)) for k, v in node.items())
  if isinstance(node, tuple):
    vals = [resolve(v, ctx) for v in node]
    return type(node)(*vals) if hasattr(node, '_fields') else type(node)(vals)
  if isinstance(node, list):
    return [resolve(v, ctx) for v in node]
  return node


class Expr:
  """A variation: a node in a lazily-evaluated expression graph.

  Construct via `Expr(fn)` where `fn(ctx: Ctx) -> value`, or through the
  factory helpers in the sibling modules. Arithmetic operators build
  derived nodes; indexing works through `[]`.
  """

  __slots__ = ('_fn', '_label')

  def __init__(self, fn: Callable[[Ctx], Any], label: str = 'expr'):
    self._fn = fn
    self._label = label

  def __call__(self, initial_value=None, current_value=None,
               random_state=None):
    return self._fn(Ctx(initial_value, current_value, random_state))

  def __repr__(self):
    return f'<variation:{self._label}>'

  def __getitem__(self, index):
    return Expr(
        lambda ctx: np.asarray(self._fn(ctx))[index],
        label=f'{self._label}[{index}]')

  def __neg__(self):
    return Expr(lambda ctx: -self._fn(ctx), label=f'neg({self._label})')


def _inject_arithmetic():
  """Installs the binary-operator surface onto Expr from one table."""
  table = {
      'add': operator.add,
      'sub': operator.sub,
      'mul': operator.mul,
      'truediv': operator.truediv,
      'floordiv': operator.floordiv,
      'mod': operator.mod,
      'pow': operator.pow,
  }

  def forward(op, name):
    def method(self, other):
      return Expr(lambda ctx: op(resolve(self, ctx), resolve(other, ctx)),
                  label=name)
    return method

  def reflected(op, name):
    def method(self, other):
      return Expr(lambda ctx: op(resolve(other, ctx), resolve(self, ctx)),
                  label=name)
    return method

  for name, op in table.items():
    setattr(Expr, f'__{name}__', forward(op, name))
    setattr(Expr, f'__r{name}__', reflected(op, name))


_inject_arithmetic()

# Back-compat names: reference code type-checks `base.Variation` and calls
# `variation_values.evaluate`; both map directly onto the Expr core.
Variation = Expr


def evaluate(structure, initial_value=None, current_value=None,
             random_state=None):
  """Evaluates nested structures of variations/constants (public API)."""
  return resolve(structure, Ctx(initial_value, current_value, random_state))


def lift(fn: Callable[..., Any], label: str = None):
  """Wraps a plain function into a variation factory.

  `lift(np.log)(x)` returns an Expr that resolves `x` (and any other
  args/kwargs, traversing nested structures) and applies `np.log`.
  """
  name = label or getattr(fn, '__name__', 'lifted')

  def factory(*args, **kwargs):
    def run(ctx):
      a = [resolve(x, ctx) for x in args]
      kw = {k: resolve(v, ctx) for k, v in kwargs.items()}
      return fn(*a, **kw)
    return Expr(run, label=name)

  factory.__name__ = name
  return factory


def stateful(make_step: Callable[[], Callable[[Ctx], Any]],
             label: str = 'stateful'):
  """Builds an Expr whose closure carries mutable state.

  `make_step` is invoked once and must return the per-call step
  function; state lives in its enclosing scope.
  """
  return Expr(make_step(), label=label)
