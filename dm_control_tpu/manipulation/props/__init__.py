"""Props for manipulation tasks (reference manipulation/props)."""

from dm_control_tpu.manipulation.props import primitive
