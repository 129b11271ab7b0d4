"""A TPU-native control suite: benchmark domains and tasks.

Mirrors the public surface of the reference suite
(dm_control/suite/__init__.py:44-150): domain modules each expose a
module-level `SUITE = containers.TaggedTasks()`; `load(domain, task)`
builds a dm_env Environment whose inner loop is one jitted function.
"""

from __future__ import annotations

import importlib
import inspect
from typing import Optional

from dm_control_tpu.rl import control

_DOMAIN_NAMES = [
    'acrobot',
    'ball_in_cup',
    'cartpole',
    'cheetah',
    'dog',
    'finger',
    'fish',
    'hopper',
    'lqr',
    'humanoid',
    'humanoid_CMU',
    'manipulator',
    'pendulum',
    'point_mass',
    'quadruped',
    'reacher',
    'stacker',
    'swimmer',
    'walker',
]

_DOMAINS = {}
for _name in _DOMAIN_NAMES:
  try:
    _DOMAINS[_name] = importlib.import_module(
        f'dm_control_tpu.suite.{_name}')
  except ImportError:
    pass  # domain not built yet


def _get_tasks(tag):
  result = []
  for domain_name in sorted(_DOMAINS.keys()):
    domain = _DOMAINS[domain_name]
    if tag is None:
      tasks_in_domain = domain.SUITE
    else:
      tasks_in_domain = domain.SUITE.tagged(tag)
    for task_name in tasks_in_domain.keys():
      result.append((domain_name, task_name))
  return tuple(result)


def _get_tasks_by_domain(tasks):
  result = {}
  for domain_name, task_name in tasks:
    result.setdefault(domain_name, []).append(task_name)
  return {k: tuple(v) for k, v in result.items()}


ALL_TASKS = _get_tasks(None)
BENCHMARKING = _get_tasks('benchmarking')
EASY = _get_tasks('easy')
HARD = _get_tasks('hard')
EXTRA = tuple(sorted(set(ALL_TASKS) - set(BENCHMARKING)))
TASKS_BY_DOMAIN = _get_tasks_by_domain(ALL_TASKS)


def load(domain_name: str, task_name: str, task_kwargs=None,
         environment_kwargs=None, visualize_reward: bool = False):
  """Returns an environment from a domain name and a task name."""
  return build_environment(domain_name, task_name, task_kwargs,
                           environment_kwargs, visualize_reward)


def build_environment(domain_name: str, task_name: str, task_kwargs=None,
                      environment_kwargs=None,
                      visualize_reward: bool = False):
  if domain_name not in _DOMAINS:
    raise ValueError(f'Domain {domain_name!r} does not exist. Available: '
                     f'{sorted(_DOMAINS)}')
  domain = _DOMAINS[domain_name]
  if task_name not in domain.SUITE:
    raise ValueError(
        f'Level {task_name!r} does not exist in domain '
        f'{domain_name!r}. Available: {sorted(domain.SUITE.keys())}')
  task_kwargs = dict(task_kwargs or {})
  if environment_kwargs is not None:
    task_kwargs = dict(task_kwargs,
                       environment_kwargs=environment_kwargs)
  env = domain.SUITE[task_name](**task_kwargs)
  env.task.visualize_reward = visualize_reward
  return env
