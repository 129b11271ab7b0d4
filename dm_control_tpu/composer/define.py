"""Decorators for declaring observables on entities.

Counterpart of reference dm_control/composer/define.py:22-70.
"""

from __future__ import annotations

import functools
import threading


class cached_property(property):  # noqa: N801 (parity naming)
  """Thread-safe cached property."""

  def __init__(self, func):
    super().__init__(func)
    self._lock = threading.RLock()

  def __get__(self, obj, cls=None):
    if obj is None:
      return self
    name = self.fget.__name__
    try:
      return obj.__dict__[name]
    except KeyError:
      with self._lock:
        if name not in obj.__dict__:
          obj.__dict__[name] = self.fget(obj)
        return obj.__dict__[name]


class observable(cached_property):  # noqa: N801 (parity naming)
  """Marks a method of an Observables subclass as an observable."""
