"""Manipulation task library: one `load(name)` entry point.

Behavioral contract: reference manipulation/__init__.py — the same
registered names/tags and a composer.Environment with a 10 s time
limit. The reference's absl `--timeout` flag becomes an explicit
kwarg.
"""

from dm_control_tpu import composer as _composer
from dm_control_tpu.manipulation.shared import registry as _registry

# importing a task module populates the registry
from dm_control_tpu.manipulation import bricks as _bricks  # noqa: F401
from dm_control_tpu.manipulation import lift as _lift  # noqa: F401
from dm_control_tpu.manipulation import place as _place  # noqa: F401
from dm_control_tpu.manipulation import reach as _reach  # noqa: F401

_registry.done_importing_tasks()

_EPISODE_SECONDS = 10.

ALL = tuple(_registry.get_all_names())
TAGS = tuple(_registry.get_tags())


def get_environments_by_tag(tag):
  """Names of all environments carrying `tag` (one of `TAGS`)."""
  return tuple(_registry.get_names_by_tag(tag))


def load(environment_name, seed=None, timeout=True):
  """Builds the named environment; `seed` seeds its RNG."""
  return _composer.Environment(
      _registry.get_constructor(environment_name)(),
      time_limit=_EPISODE_SECONDS if timeout else float('inf'),
      random_state=seed)
