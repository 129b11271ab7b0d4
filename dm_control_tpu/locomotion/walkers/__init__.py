"""Walker entities."""

from dm_control_tpu.locomotion.walkers.ant import Ant
from dm_control_tpu.locomotion.walkers.base import Walker, WalkerPose
