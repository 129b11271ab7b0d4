"""API-parity wrapper layer (reference dm_control.mujoco surface)."""

from dm_control_tpu.mujoco.engine import Physics, PhysicsError, action_spec
