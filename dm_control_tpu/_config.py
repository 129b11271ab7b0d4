"""Process-wide JAX configuration for the engine.

Enables the persistent compilation cache by default (critical on slow
hosts and for repeated jobs; harmless elsewhere). Opt out with
DMC_TPU_NO_CACHE=1 or override the location with DMC_TPU_CACHE_DIR.
"""

import os

# On single-core hosts XLA:CPU's parallel codegen can deadlock; force
# serial codegen before the backend initializes.
if (os.cpu_count() or 1) <= 2:
  _flags = os.environ.get('XLA_FLAGS', '')
  if 'parallel_codegen_split_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_cpu_parallel_codegen_split_count=1').strip()

import jax


def configure():
  if os.environ.get('DMC_TPU_NO_CACHE'):
    return
  cache_dir = os.environ.get(
      'DMC_TPU_CACHE_DIR',
      os.path.join(os.path.dirname(os.path.dirname(
          os.path.abspath(__file__))), '.jax_cache'))
  try:
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
  except Exception:
    pass


configure()
