"""Interactive environment viewer (headless-first, ray-caster backed).

Counterpart of the reference dm_control.viewer package: the same
runtime state machine, key map, and launch() entry point, rendering
through the on-device renderer instead of GLFW/OpenGL. Embedders
receive frames via `frame_callback` (notebook, video writer, streamer).
"""

from dm_control_tpu.viewer import runtime
from dm_control_tpu.viewer import user_input
from dm_control_tpu.viewer import util
from dm_control_tpu.viewer import views
from dm_control_tpu.viewer.application import Application, launch
from dm_control_tpu.viewer.web import WebViewer, launch_web
