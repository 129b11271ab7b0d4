"""Arena entities."""

from dm_control_tpu.locomotion.arenas.bowl import Bowl
from dm_control_tpu.locomotion.arenas.corridors import EmptyCorridor
from dm_control_tpu.locomotion.arenas.floors import Floor
from dm_control_tpu.locomotion.arenas.mazes import MazeWithTargets
from dm_control_tpu.locomotion.arenas.padded_room import PaddedRoom
