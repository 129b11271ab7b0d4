"""Convenience environment that plays back CMU mocap data
(reference: dm_control/locomotion/tasks/reference_pose/mocap_playback.py
:24-63)."""

import functools

from dm_control_tpu import composer
from dm_control_tpu.locomotion.arenas import floors
from dm_control_tpu.locomotion.mocap import cmu_mocap_data
from dm_control_tpu.locomotion.tasks.reference_pose import tracking
from dm_control_tpu.locomotion.walkers import cmu_humanoid


def cmu_mocap_playback_env(random_state=None):
  """Builds a playback environment over the 2020 CMU mocap dataset."""
  walker = functools.partial(
      cmu_humanoid.CMUHumanoidPositionControlledV2020)
  arena = floors.Floor()
  task = tracking.PlaybackTask(
      walker=walker,
      arena=arena,
      ref_path=cmu_mocap_data.get_path_for_cmu(version='2020'),
      dataset='walk_tiny',
  )
  return composer.Environment(
      time_limit=30, task=task, random_state=random_state,
      strip_singleton_obs_buffer_dim=True)
