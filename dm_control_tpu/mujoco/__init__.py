"""API-parity wrapper layer (reference dm_control.mujoco surface)."""

from dm_control_tpu.mujoco.engine import (Camera, CameraMatrices,
                                          MovableCamera, Physics,
                                          PhysicsError, Pose, Selected,
                                          TextOverlay, action_spec)
