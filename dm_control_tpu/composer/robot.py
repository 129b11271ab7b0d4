"""Robot: an Entity with actuators (reference composer/robot.py:26-43)."""

from __future__ import annotations

import abc

from dm_control_tpu.composer import entity


class Robot(entity.Entity, metaclass=abc.ABCMeta):
  """Base class for robot entities: entities that own actuators."""

  @property
  @abc.abstractmethod
  def actuators(self):
    """Returns the actuator elements of the robot."""
    raise NotImplementedError
