"""Prebuilt locomotion environments (the canonical composition proofs).

Behavioral contract: reference locomotion/examples/ — each factory
wires walkers, arenas, and tasks into a ready composer.Environment.
"""

from dm_control_tpu.locomotion.examples.basic_cmu_2019 import (  # noqa: F401
    cmu_humanoid_go_to_target, cmu_humanoid_maze_forage,
    cmu_humanoid_run_gaps, cmu_humanoid_run_walls)
from dm_control_tpu.locomotion.examples.basic_rodent_2020 import (  # noqa: F401
    rodent_escape_bowl, rodent_maze_forage, rodent_run_gaps,
    rodent_two_touch)
from dm_control_tpu.locomotion.examples.cmu_2020_tracking import (  # noqa: F401
    cmu_humanoid_tracking)
