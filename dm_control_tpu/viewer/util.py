"""Small utilities for the viewer
(behavioural counterpart of reference dm_control/viewer/util.py).
"""

import contextlib
import time
import traceback


class QuietSet:
  """A set of listeners supporting `+=` / `-=` that swallows dupes."""

  def __init__(self):
    self._listeners = []

  def __iadd__(self, listener):
    if listener not in self._listeners:
      self._listeners.append(listener)
    return self

  def __isub__(self, listener):
    if listener in self._listeners:
      self._listeners.remove(listener)
    return self

  def __iter__(self):
    return iter(list(self._listeners))

  def __len__(self):
    return len(self._listeners)


class Timer:
  """Measures wall-clock time spent inside `measure_time` blocks."""

  def __init__(self):
    self.measured_time = 0.0

  @contextlib.contextmanager
  def measure_time(self):
    start = time.perf_counter()
    try:
      yield
    finally:
      self.measured_time = time.perf_counter() - start

  def tick(self):
    """Returns seconds since the previous tick (0 on the first)."""
    now = time.perf_counter()
    elapsed = now - getattr(self, '_last_tick', now)
    self._last_tick = now
    return elapsed


class ErrorLogger:
  """Context manager that captures exceptions and notifies listeners."""

  def __init__(self, listeners):
    self._listeners = listeners
    self._errors_found = False

  @property
  def errors_found(self):
    return self._errors_found

  def __enter__(self):
    self._errors_found = False
    return self

  def __exit__(self, exc_type, exc_value, tb):
    if exc_type is not None:
      self._errors_found = True
      for listener in self._listeners:
        listener(exc_value)
      traceback.print_exception(exc_type, exc_value, tb)
      return True  # swallow: the viewer keeps running
    return False


class ObservableFlag:
  """A boolean flag that notifies listeners on toggle."""

  def __init__(self, initial_value=False):
    self._value = bool(initial_value)
    self._listeners = QuietSet()

  def toggle(self):
    self._value = not self._value
    for listener in self._listeners:
      listener(self._value)

  def __iadd__(self, listener):
    self._listeners += listener
    return self

  def __isub__(self, listener):
    self._listeners -= listener
    return self

  @property
  def value(self):
    return self._value

  @value.setter
  def value(self, new_value):
    if bool(new_value) != self._value:
      self.toggle()


class Integrator:
  """Integrates values over a refresh window (e.g. FPS counters)."""

  def __init__(self, refresh_rate=0.5):
    self._refresh_rate = refresh_rate
    self._sum = 0.0
    self._count = 0
    self._last_value = 0.0
    self._last_time = time.perf_counter()

  @property
  def value(self):
    return self._last_value

  @value.setter
  def value(self, v):
    self._sum += v
    self._count += 1
    now = time.perf_counter()
    if now - self._last_time >= self._refresh_rate:
      self._last_value = self._sum / max(self._count, 1)
      self._sum, self._count = 0.0, 0
      self._last_time = now
