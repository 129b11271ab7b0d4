"""Walker pose initializers.

Behavioral contract: reference locomotion/walkers/initializers/ —
strategy objects a walker consults in `reinitialize_pose`. The repo's
walkers default to their declared upright pose; passing one of these
(or any object with `initialize_pose`) overrides that per walker.
"""

from __future__ import annotations

import abc

import numpy as np


class WalkerInitializer(metaclass=abc.ABCMeta):
  """Strategy interface: put `walker` into a starting pose."""

  @abc.abstractmethod
  def initialize_pose(self, physics, walker, random_state):
    raise NotImplementedError


class UprightInitializer(WalkerInitializer):
  """The walker-declared upright pose, at rest."""

  def initialize_pose(self, physics, walker, random_state):
    del random_state
    pose = walker.upright_pose
    if pose.qpos is None:
      # no explicit configuration: settle every joint at qpos0
      joints = physics.bind(walker.mjcf_model.find_all('joint'))
      walker.configure_joints(physics, joints.qpos0)
    else:
      walker.configure_joints(physics, pose.qpos)
    walker.set_pose(physics, position=pose.xpos, quaternion=pose.xquat)
    walker.set_velocity(physics, velocity=np.zeros(3),
                        angular_velocity=np.zeros(3))


class RandomlySampledInitializer(WalkerInitializer):
  """Per-episode uniform choice among several initializers."""

  def __init__(self, initializers):
    self._choices = tuple(initializers)

  def initialize_pose(self, physics, walker, random_state):
    chosen = self._choices[random_state.randint(len(self._choices))]
    chosen.initialize_pose(physics, walker, random_state)


class NoOpInitializer(WalkerInitializer):
  """Leaves the walker wherever it is."""

  def initialize_pose(self, physics, walker, random_state):
    pass
