"""Global constants used in manipulation tasks
(reference manipulation/shared/constants.py)."""

CONTROL_TIMESTEP = 0.04  # interval between agent actions, seconds

RED = (1., 0., 0., 0.3)
GREEN = (0., 1., 0., 0.3)
BLUE = (0., 0., 1., 0.3)
CYAN = (0., 1., 1., 0.3)
MAGENTA = (1., 0., 1., 0.3)
YELLOW = (1., 1., 0., 0.3)

TASK_SITE_GROUP = 3  # invisible group for task-related sites
