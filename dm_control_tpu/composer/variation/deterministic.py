"""Non-random variations (contract: reference
composer/variation/deterministic.py). Factories over the Expr core."""

from __future__ import annotations

import itertools

from dm_control_tpu.composer.variation import _expr


def Constant(value):  # noqa: N802 (parity naming)
  """A variation that always evaluates to `value`."""
  return _expr.Expr(lambda ctx: value, label=f'const({value!r})')


def Identity():  # noqa: N802
  """Evaluates to the current value, unchanged."""
  return _expr.Expr(lambda ctx: ctx.current, label='identity')


def Sequence(values):  # noqa: N802
  """Cycles through `values`, evaluating one entry per call."""
  def make():
    stream = itertools.cycle(values)
    return lambda ctx: _expr.resolve(next(stream), ctx)
  return _expr.stateful(make, label='sequence')
