"""Batched and multi-chip environment execution."""

from dm_control_tpu.parallel.batch_env import BatchedEnvironment
