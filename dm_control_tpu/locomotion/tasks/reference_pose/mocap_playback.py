"""Canned environment that replays CMU mocap clips on a flat floor.

Behavioral contract: reference locomotion/tasks/reference_pose/
mocap_playback.py — PlaybackTask over the 2020 CMU dataset's
walk_tiny subset with a position-controlled CMU humanoid.
"""

from dm_control_tpu import composer
from dm_control_tpu.locomotion.arenas import floors
from dm_control_tpu.locomotion.mocap import cmu_mocap_data
from dm_control_tpu.locomotion.tasks.reference_pose import tracking
from dm_control_tpu.locomotion.walkers import cmu_humanoid

_TIME_LIMIT = 30
_DATASET = 'walk_tiny'


def cmu_mocap_playback_env(random_state=None):
  """Builds a playback environment over the 2020 CMU mocap dataset."""
  task = tracking.PlaybackTask(
      walker=cmu_humanoid.CMUHumanoidPositionControlledV2020,
      arena=floors.Floor(),
      ref_path=cmu_mocap_data.get_path_for_cmu(version='2020'),
      dataset=_DATASET)
  return composer.Environment(
      task=task, time_limit=_TIME_LIMIT, random_state=random_state,
      strip_singleton_obs_buffer_dim=True)
