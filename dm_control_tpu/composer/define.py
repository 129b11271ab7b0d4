"""Observable declaration decorators (contract: reference
composer/define.py — `observable` marks methods of an Observables
subclass; `cached_property` memoizes per instance)."""

from __future__ import annotations

import threading


class cached_property:  # noqa: N801 (parity naming)
  """Descriptor: computes once per instance, then serves from __dict__.

  Because this is a data-less descriptor stored under the getter's own
  name, the instance __dict__ entry shadows it after the first access —
  later reads never reenter the descriptor at all. A process-wide lock
  makes the first fill race-free.
  """

  _fill_lock = threading.RLock()

  def __init__(self, fget):
    self.fget = fget
    self.__doc__ = fget.__doc__

  def __set_name__(self, owner, name):
    self._name = name

  def __get__(self, instance, owner=None):
    if instance is None:
      return self
    with self._fill_lock:
      store = instance.__dict__
      if self._name not in store:
        store[self._name] = self.fget(instance)
      return store[self._name]


class observable(cached_property):  # noqa: N801 (parity naming)
  """Declares an observable-producing method on an Observables class."""
