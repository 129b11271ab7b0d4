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


class BoundingBox(collections.namedtuple('BoundingBox',
                                         ['lower', 'upper'])):
  """An axis-aligned region, with derived geometry for site markers."""

  __slots__ = ()

  @property
  def center(self):
    return (np.asarray(self.lower) + np.asarray(self.upper)) / 2.

  @property
  def half_extents(self):
    """Half sizes, floored at 1e-6 so marker sites stay valid."""
    span = np.asarray(self.upper) - np.asarray(self.lower)
    return np.maximum(span / 2., 1e-6)

# Yaw-only random orientation. single_sample: PropPlacer feeds the
# previous quaternion as initial_value, which would otherwise broadcast
# the scalar angle to length 4.
uniform_z_rotation = rotations.QuaternionFromAxisAngle(
    axis=(0., 0., 1.),
    angle=distributions.Uniform(-np.pi, np.pi, single_sample=True))


def _region_site(body, visible, **site_attrs):
  """A site marking a task region; hidden in the task-site group
  unless `visible`."""
  site_attrs.setdefault(
      'group', None if visible else constants.TASK_SITE_GROUP)
  return body.add('site', **site_attrs)


def add_bbox_site(body, lower, upper, visible=False, **kwargs):
  """Marks an axis-aligned box region with a site."""
  box = BoundingBox(lower, upper)
  return _region_site(body, visible, type='box', pos=box.center,
                      size=box.half_extents, **kwargs)


def add_target_site(body, radius, visible=False, **kwargs):
  """Marks a spherical target location with a site."""
  return _region_site(body, visible, type='sphere', size=[radius],
                      **kwargs)
