# Spec constants in this file reproduce task-specification values from
# dm_control (github.com/google-deepmind/dm_control), Copyright The
# dm_control Authors, Apache License 2.0.
"""Fixed camera placements for manipulation scenes.

Behavioral contract: reference manipulation/shared/cameras.py — the
same five named viewpoints (positions/orientations are the task spec)
and a helper wiring them up as configured camera observables.
"""

import collections
import dataclasses
from typing import Tuple

from dm_control_tpu.composer.observation import observable


@dataclasses.dataclass(frozen=True)
class CameraSpec:
  """A named fixed viewpoint; knows how to mount itself on an arena."""
  name: str
  pos: Tuple[float, ...]
  xyaxes: Tuple[float, ...]

  def attach_observable(self, entity, camera_settings):
    """Mounts this camera on `entity` and returns its observable."""
    mount = entity.mjcf_model.worldbody.add(
        'camera', name=self.name, pos=self.pos, xyaxes=self.xyaxes)
    view = observable.MJCFCamera(mount)
    view.configure(**camera_settings._asdict())
    return view

  # back-compat with namedtuple-style consumers
  def _asdict(self):
    return dataclasses.asdict(self)


# viewpoint name -> (position, xyaxes); values are task-spec constants
_VIEWPOINTS = {
    'front_close': ((0., -0.6, 0.75), (1., 0., 0., 0., 0.7, 0.75)),
    'front_far': ((0., -0.8, 1.), (1., 0., 0., 0., 0.7, 0.75)),
    'top_down': ((0., 0., 2.5), (1., 0., 0., 0., 1., 0.)),
    'left_close': ((-0.6, 0., 0.75), (0., -1., 0., 0.7, 0., 0.75)),
    'right_close': ((0.6, 0., 0.75), (0., 1., 0., -0.7, 0., 0.75)),
}

FRONT_CLOSE, FRONT_FAR, TOP_DOWN, LEFT_CLOSE, RIGHT_CLOSE = (
    CameraSpec(name, pos, xyaxes)
    for name, (pos, xyaxes) in _VIEWPOINTS.items())


def add_camera_observables(entity, obs_settings, *camera_specs):
  """Mounts cameras on `entity` and returns configured observables."""
  return collections.OrderedDict(
      (spec.name, spec.attach_observable(entity, obs_settings.camera))
      for spec in camera_specs)
