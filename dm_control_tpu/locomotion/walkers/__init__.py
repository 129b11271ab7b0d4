"""Walker entities."""

from dm_control_tpu.locomotion.walkers.ant import Ant
from dm_control_tpu.locomotion.walkers.base import Walker, WalkerPose
from dm_control_tpu.locomotion.walkers.cmu_humanoid import (
    CMUHumanoid, CMUHumanoidPositionControlled,
    CMUHumanoidPositionControlledV2020)
from dm_control_tpu.locomotion.walkers.rodent import Rat
