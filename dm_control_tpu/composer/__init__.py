"""Composer: component-based environment authoring framework.

Public surface follows reference dm_control/composer/__init__.py:16-31.
"""

from dm_control_tpu.composer.arena import Arena
from dm_control_tpu.composer.define import cached_property, observable
from dm_control_tpu.composer.entity import (Entity, FreePropObservableMixin,
                                            ModelWrapperEntity, Observables)
from dm_control_tpu.composer.environment import (Environment,
                                                 EpisodeInitializationError,
                                                 HOOK_NAMES)
from dm_control_tpu.composer.robot import Robot
from dm_control_tpu.composer.task import NullTask, Task

SENSOR_SITES_GROUP = 4  # reference composer/constants.py:19
