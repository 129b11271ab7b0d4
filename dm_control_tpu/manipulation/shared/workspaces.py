"""Workspace definition and visualization helpers
(reference manipulation/shared/workspaces.py:15-87)."""

import collections

import numpy as np

from dm_control_tpu.composer.variation import distributions
from dm_control_tpu.composer.variation import rotations
from dm_control_tpu.entities.manipulators import base
from dm_control_tpu.manipulation.shared import constants

_MIN_SITE_DIMENSION = 1e-6

DOWN_QUATERNION = base.DOWN_QUATERNION

BoundingBox = collections.namedtuple('BoundingBox', ['lower', 'upper'])

# single_sample: PropPlacer passes the previous quaternion as
# initial_value; without it the angle would inherit its length-4 shape
uniform_z_rotation = rotations.QuaternionFromAxisAngle(
    axis=(0., 0., 1.),
    angle=distributions.Uniform(-np.pi, np.pi, single_sample=True))


def add_bbox_site(body, lower, upper, visible=False, **kwargs):
  """Adds a box site visualizing a bounding box."""
  upper = np.array(upper)
  lower = np.array(lower)
  pos = (upper + lower) / 2.
  size = np.maximum((upper - lower) / 2., _MIN_SITE_DIMENSION)
  group = None if visible else constants.TASK_SITE_GROUP
  return body.add('site', type='box', pos=pos, size=size, group=group,
                  **kwargs)


def add_target_site(body, radius, visible=False, **kwargs):
  """Adds a sphere site visualizing a target location."""
  group = None if visible else constants.TASK_SITE_GROUP
  return body.add('site', type='sphere', size=[radius], group=group,
                  **kwargs)
