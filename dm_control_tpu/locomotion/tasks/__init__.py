"""Locomotion tasks."""

from dm_control_tpu.locomotion.tasks.corridors import RunThroughCorridor
