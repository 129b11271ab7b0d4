"""Observable definitions for composer entities.

Counterpart of reference
dm_control/composer/observation/observable/base.py:54-230 and mjcf.py:43:
each observable wraps a callable over physics with update_interval /
buffer_size / delay / aggregator / corruptor attributes consumed by the
observation Updater.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Union

import numpy as np

AGGREGATORS = {
    'min': lambda x: np.min(x, axis=0),
    'max': lambda x: np.max(x, axis=0),
    'mean': lambda x: np.mean(x, axis=0),
    'median': lambda x: np.median(x, axis=0),
    'sum': lambda x: np.sum(x, axis=0),
}


class Observable:
  """Base class for observables."""

  def __init__(self, update_interval=1, buffer_size=None, delay=None,
               aggregator=None, corruptor=None):
    self._update_interval = update_interval
    self._buffer_size = buffer_size
    self._delay = delay
    self._aggregator = aggregator
    self._corruptor = corruptor
    self._enabled = False

  # --- configurable attributes (reference base.py:54-155) ---
  @property
  def update_interval(self):
    return self._update_interval

  @update_interval.setter
  def update_interval(self, value):
    self._update_interval = value

  @property
  def buffer_size(self):
    return self._buffer_size

  @buffer_size.setter
  def buffer_size(self, value):
    self._buffer_size = value

  @property
  def delay(self):
    return self._delay

  @delay.setter
  def delay(self, value):
    self._delay = value

  @property
  def aggregator(self):
    return self._aggregator

  @aggregator.setter
  def aggregator(self, value):
    if isinstance(value, str):
      value = AGGREGATORS[value]
    self._aggregator = value

  @property
  def corruptor(self):
    return self._corruptor

  @corruptor.setter
  def corruptor(self, value):
    self._corruptor = value

  @property
  def enabled(self):
    return self._enabled

  @enabled.setter
  def enabled(self, value):
    self._enabled = bool(value)

  def _callable(self, physics) -> Callable[[], np.ndarray]:
    raise NotImplementedError

  def observation_callable(self, physics, random_state=None):
    """Returns a zero-arg callable yielding the (corrupted) value."""
    raw = self._callable(physics)
    if self._corruptor is not None:
      def corrupted():
        return self._corruptor(raw(), random_state=random_state)
      return corrupted
    return raw

  def __call__(self, physics):
    return self.observation_callable(physics)()

  def configure(self, **kwargs):
    for key, value in kwargs.items():
      if not hasattr(type(self), key):
        raise AttributeError(f'cannot configure {key!r}')
      setattr(self, key, value)


class Generic(Observable):
  """Wraps any callable(physics) -> array."""

  def __init__(self, raw_observation_callable, **kwargs):
    self._raw = raw_observation_callable
    super().__init__(**kwargs)

  def _callable(self, physics):
    return lambda: np.asarray(self._raw(physics))


class MujocoFeature(Observable):
  """A named field of physics.named.data (reference base.py:196-230)."""

  def __init__(self, kind, feature_name, **kwargs):
    self._kind = kind
    self._feature_name = feature_name
    super().__init__(**kwargs)

  def _callable(self, physics):
    kind = self._kind
    name = self._feature_name
    def read():
      indexer = getattr(physics.named.data, kind)
      return np.asarray(indexer[name])
    return read


class MJCFCamera(Observable):
  """Pixels rendered from an MJCF camera element via the on-device
  ray-caster (reference observation/observable/mjcf.py:105-276)."""

  def __init__(self, mjcf_element, height=240, width=320, depth=False,
               segmentation=False, **kwargs):
    if depth and segmentation:
      raise ValueError('depth and segmentation are mutually exclusive')
    self._camera_element = mjcf_element
    self._height = height
    self._width = width
    self._depth = depth
    self._segmentation = segmentation
    super().__init__(**kwargs)

  @property
  def height(self):
    return self._height

  @height.setter
  def height(self, value):
    self._height = int(value)

  @property
  def width(self):
    return self._width

  @width.setter
  def width(self, value):
    self._width = int(value)

  def _callable(self, physics):
    name = self._camera_element.full_identifier

    def read():
      cam_id = physics.model.names.name2id('camera', name)
      return physics.render(
          height=self._height, width=self._width, camera_id=cam_id,
          depth=self._depth, segmentation=self._segmentation)

    return read


class MJCFFeature(Observable):
  """A bound attribute of one or more MJCF elements (mjcf.py:43)."""

  def __init__(self, kind, mjcf_element, index=None, **kwargs):
    self._kind = kind
    self._elements = mjcf_element
    self._index = index
    super().__init__(**kwargs)

  def _callable(self, physics):
    kind = self._kind
    elements = self._elements
    index = self._index
    def read():
      value = getattr(physics.bind(elements), kind)
      value = np.asarray(value)
      if index is not None:
        value = value[index]
      return value
    return read
