"""A structured set of manipulation tasks with a single entry point
(reference manipulation/__init__.py:17-76)."""

from dm_control_tpu import composer as _composer
from dm_control_tpu.manipulation import bricks as _bricks
from dm_control_tpu.manipulation import lift as _lift
from dm_control_tpu.manipulation import place as _place
from dm_control_tpu.manipulation import reach as _reach
from dm_control_tpu.manipulation.shared import registry as _registry

_registry.done_importing_tasks()

_TIME_LIMIT = 10.

ALL = tuple(_registry.get_all_names())
TAGS = tuple(_registry.get_tags())


def get_environments_by_tag(tag):
  """Names of all environments matching a given tag."""
  return tuple(_registry.get_names_by_tag(tag))


def load(environment_name, seed=None, timeout=True):
  """Loads a manipulation environment by name.

  Unlike the reference (which routes `timeout` through an absl flag),
  the time limit toggle is an explicit kwarg.
  """
  task = _registry.get_constructor(environment_name)()
  time_limit = _TIME_LIMIT if timeout else float('inf')
  return _composer.Environment(task, time_limit=time_limit,
                               random_state=seed)
