"""Populate the persistent XLA compilation cache for the test lane.

The default pytest lane runs with cache WRITES disabled: jaxlib's
XLA:CPU executable serializer can segfault inside
`compilation_cache.put_executable_and_time` once a single process has
compiled a few hundred modules (observed deterministically around test
48 of a full `pytest tests/` run, and never in a fresh process — the
crash is process-state-dependent, not executable-dependent). Writing
from short-lived subprocesses sidesteps it: this script runs every
test file in its own `pytest` process with writes enabled
(DMC_TPU_CACHE_WRITE=1, see tests/conftest.py), so each process
compiles a handful of modules, persists them, and exits before
reaching the corrupting regime.

Usage:  python tools/warm_cache.py [pattern ...]
        (patterns filter test files by substring; default = all)

A test failure does not stop the warm — the goal is cache population,
not a green run; run the real lane afterwards:  pytest tests/ -q
"""

import glob
import os
import subprocess
import sys
import time


def main():
  root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  files = sorted(glob.glob(os.path.join(root, 'tests', 'test_*.py')))
  pats = sys.argv[1:]
  if pats:
    files = [f for f in files if any(p in os.path.basename(f)
                                     for p in pats)]
  env = dict(os.environ, DMC_TPU_CACHE_WRITE='1')
  t00 = time.time()
  failures = []
  for i, f in enumerate(files):
    name = os.path.basename(f)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, '-m', 'pytest', f, '-q', '--no-header',
         '-p', 'no:cacheprovider'],
        env=env, cwd=root, capture_output=True, text=True)
    dt = time.time() - t0
    tail = (proc.stdout.strip().splitlines() or ['?'])[-1]
    status = 'ok' if proc.returncode == 0 else f'rc={proc.returncode}'
    print(f'[{i + 1}/{len(files)}] {name:42s} {dt:7.1f}s  '
          f'{status}  {tail}', flush=True)
    if proc.returncode != 0:
      failures.append(name)
  print(f'warm done in {time.time() - t00:.0f}s; '
        f'{len(failures)} file(s) had failures: {failures}')


if __name__ == '__main__':
  main()
