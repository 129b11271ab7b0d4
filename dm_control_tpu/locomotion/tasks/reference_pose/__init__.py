"""Tasks that track motion-capture reference poses."""

from dm_control_tpu.locomotion.tasks.reference_pose import cmu_subsets
from dm_control_tpu.locomotion.tasks.reference_pose import types
from dm_control_tpu.locomotion.tasks.reference_pose.tracking import (
    MultiClipMocapTracking, PlaybackTask, ReferencePosesTask)
