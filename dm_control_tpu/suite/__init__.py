"""A TPU-native control suite: benchmark domains and tasks.

Public surface parity: reference dm_control/suite/__init__.py — domain
modules each expose `SUITE = containers.TaggedTasks()`, and
`load(domain, task)` builds a dm_env Environment whose inner loop is a
single jitted function.
"""

from __future__ import annotations

import importlib

_DOMAIN_NAMES = (
    'acrobot', 'ball_in_cup', 'cartpole', 'cheetah', 'dog', 'finger',
    'fish', 'hopper', 'humanoid', 'humanoid_CMU', 'lqr', 'manipulator',
    'pendulum', 'point_mass', 'quadruped', 'reacher', 'stacker',
    'swimmer', 'walker',
)


def _import_domains():
  found = {}
  for name in _DOMAIN_NAMES:
    try:
      found[name] = importlib.import_module(f'dm_control_tpu.suite.{name}')
    except ImportError:
      continue  # domain not built yet
  return found


_DOMAINS = _import_domains()


def _catalog(tag=None):
  """(domain, task) pairs, sorted by domain, optionally tag-filtered."""
  return tuple(
      (domain, task)
      for domain in sorted(_DOMAINS)
      for task in (_DOMAINS[domain].SUITE.tagged(tag) if tag
                   else _DOMAINS[domain].SUITE))


ALL_TASKS = _catalog()
BENCHMARKING = _catalog('benchmarking')
EASY = _catalog('easy')
HARD = _catalog('hard')
EXTRA = tuple(sorted(set(ALL_TASKS) - set(BENCHMARKING)))

TASKS_BY_DOMAIN = {}
for _d, _t in ALL_TASKS:
  TASKS_BY_DOMAIN.setdefault(_d, []).append(_t)
TASKS_BY_DOMAIN = {k: tuple(v) for k, v in TASKS_BY_DOMAIN.items()}


def build_environment(domain_name: str, task_name: str, task_kwargs=None,
                      environment_kwargs=None,
                      visualize_reward: bool = False):
  """Instantiates `domain_name`/`task_name` with the given options."""
  try:
    registry = _DOMAINS[domain_name].SUITE
  except KeyError:
    raise ValueError(
        f'Domain {domain_name!r} does not exist. Available: '
        f'{sorted(_DOMAINS)}') from None
  if task_name not in registry:
    raise ValueError(
        f'Level {task_name!r} does not exist in domain {domain_name!r}. '
        f'Available: {sorted(registry.keys())}')
  options = dict(task_kwargs or {})
  if environment_kwargs is not None:
    options['environment_kwargs'] = environment_kwargs
  env = registry[task_name](**options)
  env.task.visualize_reward = visualize_reward
  return env


def load(domain_name: str, task_name: str, task_kwargs=None,
         environment_kwargs=None, visualize_reward: bool = False):
  """Returns an environment from a domain name and a task name."""
  return build_environment(domain_name, task_name, task_kwargs,
                           environment_kwargs, visualize_reward)
