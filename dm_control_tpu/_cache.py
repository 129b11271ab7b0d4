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
  """Machine+toolchain-keyed persistent cache directory under `root`."""
  key = 'generic'
  try:
    with open('/proc/cpuinfo') as f:
      for line in f:
        if line.startswith('flags'):
          key = line
          break
  except OSError:
    pass
  # The jaxlib version must be part of the key: XLA:CPU AOT executables
  # embed target-machine features chosen by the *compiler build* (e.g.
  # +prefer-no-scatter), so entries written by a different jaxlib on an
  # identical CPU still fail the loader's feature check.
  try:
    import jaxlib.version
    key += jaxlib.version.__version__
  except Exception:
    pass
  sig = hashlib.sha1(key.encode()).hexdigest()[:12]
  path = os.path.join(root, f'.jax_cache-{sig}')
  os.makedirs(path, exist_ok=True)
  return path


def configure(jax_config, root: str,
              min_compile_time_secs: float = 1.0,
              read_only: bool = False) -> None:
  """Point jax's persistent cache at the machine-keyed directory.

  min_compile_time_secs=1.0 skips persisting trivial executables —
  an unbounded cache (3k+ entries) both slows the write path and grows
  without limit across rounds.

  read_only=True keeps cache READS active but suppresses all writes
  (by raising the write threshold beyond any real compile time).
  XLA:CPU executable serialization in the write path can segfault in
  long-running processes that have compiled hundreds of modules (the
  crash reproduces at ~test 48 of a full pytest lane but never in a
  fresh process), so the test lane runs read-only and the cache is
  populated by tools/warm_cache.py, which compiles each test file in
  its own short-lived subprocess with writes enabled.
  """
  jax_config.update('jax_compilation_cache_dir', cache_dir(root))
  jax_config.update('jax_persistent_cache_min_compile_time_secs',
                    1e18 if read_only else min_compile_time_secs)
