"""TPU-native rendering (no OpenGL anywhere).

Replaces the reference's GL context + mjr_render pixel path
(reference dm_control/_render/, dm_control/mujoco/engine.py:810-946)
with an analytic ray-caster over the model's geom primitives — a pure
jax function of (Model, Data), so it jits, vmaps over env batches, and
runs on the accelerator next to physics.
"""

from dm_control_tpu.render.rasterizer import camera_pose, render

__all__ = ['camera_pose', 'render']
