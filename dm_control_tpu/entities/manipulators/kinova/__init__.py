"""Kinova robot entities (reference entities/manipulators/kinova)."""

from dm_control_tpu.entities.manipulators.kinova.jaco_arm import JacoArm
from dm_control_tpu.entities.manipulators.kinova.jaco_hand import JacoHand
