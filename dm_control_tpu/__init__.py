"""dm_control_tpu: a TPU-native physics simulation and RL environment stack.

A from-scratch rebuild of the capabilities of dm_control (environments,
MJCF models, control suite, composer) on a JAX/XLA/Pallas physics engine:
models compile to device-resident struct-of-arrays, dynamics run as pure
jitted functions, and thousands of environments batch under vmap per chip.
"""

__version__ = '0.1.0'

from dm_control_tpu import _config as _config  # noqa: F401 (cache setup)
