"""Locomotion tasks."""

from dm_control_tpu.locomotion.tasks.corridors import RunThroughCorridor
from dm_control_tpu.locomotion.tasks.escape import Escape
from dm_control_tpu.locomotion.tasks.go_to_target import GoToTarget
from dm_control_tpu.locomotion.tasks.random_goal_maze import (
    ManyGoalsMaze)
from dm_control_tpu.locomotion.tasks.reach import TwoTouch
