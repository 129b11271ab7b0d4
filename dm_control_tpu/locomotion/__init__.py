"""Locomotion library: walkers, arenas and tasks (reference
dm_control/locomotion). Round 1 ships the core walker/arena/task
abstractions and the Ant walker; richer walkers, mazes, mocap tracking
and soccer land in subsequent rounds."""
