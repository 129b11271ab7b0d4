"""Global registry of manipulation environment constructors
(contract: reference manipulation/shared/registry.py)."""

from dm_control_tpu.utils import containers

_ALL_CONSTRUCTORS = containers.TaggedTasks(allow_overriding_keys=False)

add = _ALL_CONSTRUCTORS.add
get_constructor = _ALL_CONSTRUCTORS.__getitem__
get_all_names = _ALL_CONSTRUCTORS.keys
get_tags = _ALL_CONSTRUCTORS.tags
get_names_by_tag = _ALL_CONSTRUCTORS.tagged


def register(name, factory, *tags):
  """Registers `factory` under an explicit `name` (for generated
  factories whose __name__ would otherwise not match)."""
  factory.__name__ = name
  add(*tags)(factory)


def done_importing_tasks():
  _ALL_CONSTRUCTORS.allow_overriding_keys = True
