"""Shares one sampled value across several consumers (contract:
reference composer/variation/variation_broadcaster.py).

Design: the broadcaster keeps a monotonically growing list of samples
plus a per-proxy cursor. A proxy whose cursor has caught up to the end
of the list triggers a fresh draw; otherwise it replays the sample at
its cursor. Dead proxies (garbage-collected) are dropped from cursor
bookkeeping via weak references so they cannot stall the round.
"""

from __future__ import annotations

import weakref

from dm_control_tpu.composer.variation import _expr


class VariationBroadcaster:
  """Fans a single variation's samples out to multiple proxy exprs."""

  def __init__(self, wrapped_variation):
    self._source = wrapped_variation
    self._samples = []
    self._cursors = weakref.WeakKeyDictionary()

  def get_proxy(self):
    """Returns an Expr yielding the shared per-round sample."""
    handle = _Handle()
    self._cursors[handle] = 0

    def run(ctx):
      # `handle` is captured by this closure, so its lifetime (and the
      # cursor entry keyed on it) tracks the proxy's own.
      return self._next(handle, ctx)

    return _expr.Expr(run, label='broadcast_proxy')

  def _next(self, handle, ctx):
    cursor = self._cursors[handle]
    if cursor == len(self._samples):
      self._samples.append(_expr.resolve(self._source, ctx))
    value = self._samples[cursor]
    self._cursors[handle] = cursor + 1
    self._trim()
    return value

  def _trim(self):
    """Discards samples every live proxy has already consumed."""
    if not self._cursors:
      self._samples.clear()
      return
    done = min(self._cursors.values())
    if done:
      del self._samples[:done]
      for handle in self._cursors:
        self._cursors[handle] -= done


class _Handle:
  """Weak-referenceable cursor key (Expr uses __slots__)."""
  __slots__ = ('__weakref__',)
