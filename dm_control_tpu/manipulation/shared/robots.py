"""Custom robot constructors with manipulation-specific defaults
(reference manipulation/shared/robots.py)."""

from dm_control_tpu.entities.manipulators import kinova
from dm_control_tpu.manipulation.shared import observations

ARM_OFFSET = (0., 0.4, 0.)


def make_arm(obs_settings):
  """Constructs a Jaco arm with manipulation-specific observables."""
  return kinova.JacoArm(
      observable_options=observations.make_options(
          obs_settings, observations.JACO_ARM_OBSERVABLES))


def make_hand(obs_settings):
  """Constructs a Jaco hand with manipulation-specific observables."""
  return kinova.JacoHand(
      use_pinch_site_as_tcp=True,
      observable_options=observations.make_options(
          obs_settings, observations.JACO_HAND_OBSERVABLES))
