"""Delayed / buffered observation ring buffer.

Behavioural counterpart of reference
dm_control/composer/observation/obs_buffer.py:49-230: values arrive with
timestamps and delays, become observable at arrival time, and reads
return the most recent `buffer_size` observable values (padded at the
front with the oldest value when under-full).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class Buffer:
  """Ring of (arrival_time, value) with out-of-order insertion."""

  def __init__(self, buffer_size: int, shape, dtype,
               pad_value=0, strip_singleton_buffer_dim: bool = False):
    self._buffer_size = buffer_size
    self._shape = tuple(shape)
    self._dtype = dtype
    self._strip = strip_singleton_buffer_dim and buffer_size == 1
    self._arrival = []
    self._values = []

  @property
  def shape(self):
    if self._strip:
      return self._shape
    return (self._buffer_size,) + self._shape

  @property
  def dtype(self):
    return self._dtype

  def insert(self, timestamp: float, delay: float, value) -> None:
    arrival = timestamp + delay
    value = np.asarray(value, dtype=self._dtype)
    # insertion sort by arrival time (arrivals may be out of order)
    idx = len(self._arrival)
    while idx > 0 and self._arrival[idx - 1] > arrival:
      idx -= 1
    self._arrival.insert(idx, arrival)
    self._values.insert(idx, value)
    # drop entries that can never be read again: keep at most
    # buffer_size already-arrived entries plus all pending ones
    self._trim()

  def _trim(self):
    if len(self._arrival) > 10 * max(self._buffer_size, 1) + 100:
      excess = len(self._arrival) - self._buffer_size
      del self._arrival[:excess]
      del self._values[:excess]

  def read(self, current_time: float) -> np.ndarray:
    """Returns the stacked last `buffer_size` arrived values."""
    arrived = [v for t, v in zip(self._arrival, self._values)
               if t <= current_time + 1e-12]
    out = np.zeros((self._buffer_size,) + self._shape,
                   dtype=self._dtype)
    if arrived:
      take = arrived[-self._buffer_size:]
      n = len(take)
      out[self._buffer_size - n:] = np.stack(take)
      # pad the front with the oldest available value
      out[:self._buffer_size - n] = take[0]
    if self._strip:
      return out[0]
    return out

  def drop_unobserved_upcoming_items(self, observation_schedule,
                                     read_interval: int):
    """Plans future updates; prunes ones that can never be read.

    observation_schedule: list of (timestamp, delay) pairs; modified
    in place (reference obs_buffer.py:173-230 contract).
    """
    if not observation_schedule:
      return
    keep = []
    # a planned update is observable if its arrival falls at or before
    # some future read; with periodic reads every read_interval, an
    # arrival is readable unless a strictly newer arrival lands at or
    # before the same read tick (and the buffer only keeps the newest).
    if self._buffer_size > 1:
      keep = list(observation_schedule)
    else:
      arrivals = [(t + d, i) for i, (t, d) in
                  enumerate(observation_schedule)]
      for i, (t, d) in enumerate(observation_schedule):
        arrival = t + d
        read_tick = np.ceil(arrival / read_interval) * read_interval
        superseded = any(
            a <= read_tick and a > arrival for a, j in arrivals
            if j != i)
        if not superseded:
          keep.append((t, d))
    observation_schedule[:] = keep
