"""Math ops over variation expressions (contract: reference
composer/variation/math.py). Each op is `lift`-ed numpy — no class
hierarchy needed."""

import numpy as np

from dm_control_tpu.composer.variation._expr import lift

Log = lift(np.log, 'Log')
Max = lift(np.max, 'Max')
Min = lift(np.min, 'Min')
Norm = lift(np.linalg.norm, 'Norm')

__all__ = ['Log', 'Max', 'Min', 'Norm']
