"""Prebuilt CMU-2020 mocap tracking environment.

Behavioral contract: reference locomotion/examples/cmu_2020_tracking.py
— MultiClipMocapTracking over the 2020 walk_tiny subset with the
position-controlled V2020 humanoid and the CoMic reward.
"""

from dm_control_tpu import composer
from dm_control_tpu.locomotion.arenas import floors
from dm_control_tpu.locomotion.mocap import cmu_mocap_data
from dm_control_tpu.locomotion.tasks.reference_pose import tracking
from dm_control_tpu.locomotion.walkers import cmu_humanoid

# task-spec configuration (values are the reference's)
_TRACKING_CONFIG = dict(
    dataset='walk_tiny',
    ref_steps=(1, 2, 3, 4, 5),
    min_steps=10,
    reward_type='comic',
)
_EPISODE_SECONDS = 30


def cmu_humanoid_tracking(random_state=None):
  """Track motion-capture reference clips."""
  return composer.Environment(
      task=tracking.MultiClipMocapTracking(
          walker=cmu_humanoid.CMUHumanoidPositionControlledV2020,
          arena=floors.Floor(),
          ref_path=cmu_mocap_data.get_path_for_cmu(version='2020'),
          **_TRACKING_CONFIG),
      time_limit=_EPISODE_SECONDS, random_state=random_state,
      strip_singleton_obs_buffer_dim=True)
