"""Walker pose initializers.

Behavioral contract: reference locomotion/walkers/initializers/ —
strategy objects a walker consults in `reinitialize_pose`. The repo's
walkers default to their declared upright pose; passing one of these
(or any object with `initialize_pose`) overrides that per walker.
"""

from __future__ import annotations

import abc

import numpy as np


def settle(physics, walker, pose) -> None:
  """Writes a WalkerPose (joints + root frame) and zeroes velocity.

  A pose with qpos=None means "every joint at its reference qpos0".
  Shared by UprightInitializer and base.Walker.reinitialize_pose so
  the two paths cannot drift apart.
  """
  if pose.qpos is None:
    joints = walker.mjcf_model.find_all('joint')
    walker.configure_joints(physics, physics.bind(joints).qpos0)
  else:
    walker.configure_joints(physics, pose.qpos)
  walker.set_pose(physics, position=pose.xpos, quaternion=pose.xquat)
  try:
    walker.set_velocity(physics, velocity=np.zeros(3),
                        angular_velocity=np.zeros(3))
  except ValueError:
    pass  # fixed-base walker: no free root to zero


class WalkerInitializer(metaclass=abc.ABCMeta):
  """Strategy interface: put `walker` into a starting pose."""

  @abc.abstractmethod
  def initialize_pose(self, physics, walker, random_state):
    raise NotImplementedError


class NoOpInitializer(WalkerInitializer):
  """Leaves the walker wherever it is."""

  def initialize_pose(self, physics, walker, random_state):
    pass


class UprightInitializer(WalkerInitializer):
  """The walker-declared upright pose, at rest."""

  def initialize_pose(self, physics, walker, random_state):
    del random_state
    settle(physics, walker, walker.upright_pose)


class RandomlySampledInitializer(WalkerInitializer):
  """Per-episode uniform choice among several initializers."""

  def __init__(self, initializers):
    self._choices = tuple(initializers)

  def initialize_pose(self, physics, walker, random_state):
    pick = random_state.randint(len(self._choices))
    self._choices[pick].initialize_pose(physics, walker, random_state)
