"""Robot arm and hand entities (reference entities/manipulators)."""

from dm_control_tpu.entities.manipulators import base
from dm_control_tpu.entities.manipulators import kinova
