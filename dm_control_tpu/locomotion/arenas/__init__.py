"""Arena entities."""

from dm_control_tpu.locomotion.arenas.corridors import EmptyCorridor
from dm_control_tpu.locomotion.arenas.floors import Floor
