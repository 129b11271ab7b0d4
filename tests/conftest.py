"""Test configuration: force the true CPU backend with 8 virtual devices.

NOTE: in this environment the 'axon' TPU plugin registers itself as the
default backend and the JAX_PLATFORMS env var is ignored — platform
selection must go through jax.config BEFORE any backend initializes.
Real-chip benchmarking happens in bench.py, not tests.
"""
import os

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
