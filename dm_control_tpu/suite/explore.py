"""Control suite environments explorer (the suite's front door).

Behavioral contract: reference suite/explore.py — pick (or be prompted
for) a `domain.task` pair, optionally disable the episode time limit,
optionally wrap with Gaussian action noise, and hand the loader to the
interactive viewer. On a headless TPU host the viewer is the built-in
browser front-end (viewer.launch_web); pass --window for the classic
blocking in-process loop with a frame callback instead.

    python -m dm_control_tpu.suite.explore --environment_name=cheetah.run
"""

from __future__ import annotations

import argparse


def _all_names():
  from dm_control_tpu import suite
  return ['.'.join(pair) for pair in suite.ALL_TASKS]


def prompt_environment_name(prompt, values):
  name = None
  while not name:
    name = input(prompt)
    if name not in values:
      print(f'{name!r} is not a valid environment name.')
      name = None
  return name


def main(argv=None):
  from dm_control_tpu import suite
  from dm_control_tpu import viewer
  from dm_control_tpu.suite.wrappers import action_noise

  names = _all_names()
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--environment_name', choices=names, default=None,
                      help="'domain.task' pair; prompted if omitted")
  parser.add_argument('--no-timeout', dest='timeout',
                      action='store_false', default=True,
                      help='run episodes without a time limit')
  parser.add_argument('--action_noise', type=float, default=0.0,
                      help='Gaussian action noise scale (fraction of '
                           'the action range per dimension)')
  parser.add_argument('--port', type=int, default=8000,
                      help='web viewer port')
  parser.add_argument('--window', action='store_true',
                      help='run the in-process loop instead of the '
                           'web viewer')
  args = parser.parse_args(argv)

  name = args.environment_name
  if name is None:
    print('\n  '.join(['Available environments:'] + names))
    name = prompt_environment_name(
        'Please select an environment name: ', names)
  domain_name, task_name = name.split('.')

  task_kwargs = {}
  if not args.timeout:
    task_kwargs['time_limit'] = float('inf')

  def loader():
    env = suite.load(domain_name=domain_name, task_name=task_name,
                     task_kwargs=task_kwargs)
    if args.action_noise > 0:
      env = action_noise.Wrapper(env, scale=args.action_noise)
    return env

  if args.window:
    viewer.launch(loader)
  else:
    viewer.launch_web(loader, port=args.port)


if __name__ == '__main__':
  main()
