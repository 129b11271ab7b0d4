"""Composer initializers (reference dm_control/composer/initializers)."""

import abc

from dm_control_tpu.composer.initializers.prop_initializer import PropPlacer
from dm_control_tpu.composer.initializers.tcp_initializer import (
    ToolCenterPointInitializer)

__all__ = ['Initializer', 'PropPlacer', 'ToolCenterPointInitializer']


class Initializer(metaclass=abc.ABCMeta):
  """Base class for episode initializers
  (reference composer/initializer.py:21)."""

  @abc.abstractmethod
  def __call__(self, physics, random_state):
    raise NotImplementedError
