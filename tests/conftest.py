"""Test configuration: force the true CPU backend with 8 virtual devices.

NOTE: in this environment the 'axon' TPU plugin registers itself as the
default backend and the JAX_PLATFORMS env var is ignored — platform
selection must go through jax.config BEFORE any backend initializes.
Real-chip benchmarking happens in bench.py, not tests.

The persistent compilation cache is keyed by the host CPU signature
(see dm_control_tpu/_cache.py): XLA:CPU AOT executables from a
different machine abort the process on load, which is what killed
full-suite runs at round 4 (SIGABRT inside put_executable_and_time
while a mismatched cache was active).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import jax

from dm_control_tpu import _cache

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
# Read-only by default: the XLA:CPU AOT serializer can segfault when a
# single process that has already compiled hundreds of modules writes
# another entry (reproduced at ~test 48 of the full lane; never in a
# fresh process). tools/warm_cache.py populates the cache from short
# per-file subprocesses, which set DMC_TPU_CACHE_WRITE=1.
_cache.configure(jax.config, os.path.dirname(os.path.dirname(__file__)),
                 min_compile_time_secs=1.0,
                 read_only=os.environ.get('DMC_TPU_CACHE_WRITE') != '1')
