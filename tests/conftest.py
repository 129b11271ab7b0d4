"""Test configuration: run on a virtual 8-device CPU mesh.

TPU compiles are slow and single-chip; tests exercise numerics on CPU and
sharding on a forced 8-device host platform, per the multi-chip test
strategy (real-chip benchmarking happens in bench.py, not tests).
"""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'host_platform_device_count' not in flags:
  flags = (flags + ' --xla_force_host_platform_device_count=8').strip()
if 'parallel_codegen_split_count' not in flags:
  # parallel codegen can deadlock on 1-core hosts
  flags = (flags + ' --xla_cpu_parallel_codegen_split_count=1').strip()
os.environ['XLA_FLAGS'] = flags

import jax

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
