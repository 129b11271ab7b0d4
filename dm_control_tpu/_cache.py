"""Persistent-compilation-cache configuration shared by tests/bench.

The cache directory is keyed by the host CPU's feature flags: XLA:CPU
persists AOT-compiled executables, and loading an entry compiled on a
host with different machine features aborts the process (cpu_aot_loader
warns "could lead to execution errors such as SIGILL" — observed as a
SIGABRT mid-test-suite when a cache written on one driver machine was
reused on another). Keying by CPU signature makes stale entries
unreachable instead of fatal.
"""

import hashlib
import os


def cache_dir(root: str) -> str:
  """Machine-keyed persistent cache directory under `root`."""
  sig = 'generic'
  try:
    with open('/proc/cpuinfo') as f:
      for line in f:
        if line.startswith('flags'):
          sig = hashlib.sha1(line.encode()).hexdigest()[:12]
          break
  except OSError:
    pass
  path = os.path.join(root, f'.jax_cache-{sig}')
  os.makedirs(path, exist_ok=True)
  return path


def configure(jax_config, root: str,
              min_compile_time_secs: float = 1.0) -> None:
  """Point jax's persistent cache at the machine-keyed directory.

  min_compile_time_secs=1.0 skips persisting trivial executables —
  an unbounded cache (3k+ entries) both slows the write path and grows
  without limit across rounds.
  """
  jax_config.update('jax_compilation_cache_dir', cache_dir(root))
  jax_config.update('jax_persistent_cache_min_compile_time_secs',
                    min_compile_time_secs)
