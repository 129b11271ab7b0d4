"""Observation pipeline: observables, buffers, updater."""

from dm_control_tpu.composer.observation import obs_buffer
from dm_control_tpu.composer.observation import observable
from dm_control_tpu.composer.observation.updater import Updater
