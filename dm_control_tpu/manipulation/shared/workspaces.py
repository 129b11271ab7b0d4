# Spec constants in this file reproduce task-specification values from
# dm_control (github.com/google-deepmind/dm_control), Copyright The
# dm_control Authors, Apache License 2.0.
"""Workspace regions and their debug visualizations.

Behavioral contract: reference manipulation/shared/workspaces.py —
BoundingBox regions, a shared down-facing TCP quaternion, uniform-yaw
prop orientation, and invisible task-group sites marking spawn regions.
"""

import collections

import numpy as np

from dm_control_tpu.composer.variation import distributions
from dm_control_tpu.composer.variation import rotations
from dm_control_tpu.entities.manipulators import base
from dm_control_tpu.manipulation.shared import constants

DOWN_QUATERNION = base.DOWN_QUATERNION

BoundingBox = collections.namedtuple('BoundingBox', ['lower', 'upper'])

# Yaw-only random orientation. single_sample: PropPlacer feeds the
# previous quaternion as initial_value, which would otherwise broadcast
# the scalar angle to length 4.
uniform_z_rotation = rotations.QuaternionFromAxisAngle(
    axis=(0., 0., 1.),
    angle=distributions.Uniform(-np.pi, np.pi, single_sample=True))


def _site_group(visible):
  return None if visible else constants.TASK_SITE_GROUP


def add_bbox_site(body, lower, upper, visible=False, **kwargs):
  """Marks an axis-aligned box region with a site."""
  lower, upper = np.asarray(lower), np.asarray(upper)
  half = np.maximum((upper - lower) / 2., 1e-6)
  return body.add('site', type='box', pos=(lower + upper) / 2.,
                  size=half, group=_site_group(visible), **kwargs)


def add_target_site(body, radius, visible=False, **kwargs):
  """Marks a spherical target location with a site."""
  return body.add('site', type='sphere', size=[radius],
                  group=_site_group(visible), **kwargs)
