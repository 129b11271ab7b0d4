"""Observation configuration presets for manipulation tasks.

Behavioral contract: reference manipulation/shared/observations.py —
the same two presets (PERFECT_FEATURES / VISION), the same observable
categories (proprio, ftt, prop_pose, camera) and per-entity observable
name groups. Restructured as dataclasses over a category table.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import numpy as np

CATEGORIES = ('proprio', 'ftt', 'prop_pose', 'camera')


@dataclasses.dataclass(frozen=True)
class ObservableSpec:
  """Configuration applied to a single observable."""
  enabled: bool = False
  update_interval: int = 1
  buffer_size: int = 1
  delay: int = 0
  aggregator: Optional[Callable] = None
  corruptor: Optional[Callable] = None

  def _asdict(self):
    return dataclasses.asdict(self)

  def _replace(self, **changes):
    return dataclasses.replace(self, **changes)


@dataclasses.dataclass(frozen=True)
class CameraObservableSpec(ObservableSpec):
  """Observable configuration plus render size for cameras."""
  height: int = 84
  width: int = 84


@dataclasses.dataclass(frozen=True)
class ObservationSettings:
  """One ObservableSpec per category."""
  proprio: ObservableSpec
  ftt: ObservableSpec
  prop_pose: ObservableSpec
  camera: CameraObservableSpec

  def _asdict(self):
    return {c: getattr(self, c) for c in CATEGORIES}


@dataclasses.dataclass(frozen=True)
class ObservableNames:
  """Observable names grouped by category, for one entity."""
  proprio: Tuple[str, ...] = ()
  ftt: Tuple[str, ...] = ()
  prop_pose: Tuple[str, ...] = ()
  camera: Tuple[str, ...] = ()


def _signed_log1p(value, random_state):
  """Compresses force/torque/touch magnitudes symmetrically."""
  del random_state
  return np.sign(value) * np.log1p(np.abs(value))


_ON = ObservableSpec(enabled=True)
_OFF = ObservableSpec(enabled=False)

PERFECT_FEATURES = ObservationSettings(
    proprio=_ON,
    ftt=_ON._replace(corruptor=_signed_log1p),
    prop_pose=_ON,
    camera=CameraObservableSpec(enabled=False))

VISION = ObservationSettings(
    proprio=_ON,
    ftt=_ON._replace(corruptor=_signed_log1p),
    prop_pose=_OFF,
    camera=CameraObservableSpec(enabled=True))

JACO_ARM_OBSERVABLES = ObservableNames(
    proprio=('joints_pos', 'joints_vel'),
    ftt=('joints_torque',))

JACO_HAND_OBSERVABLES = ObservableNames(
    proprio=('joints_pos', 'joints_vel', 'pinch_site_pos',
             'pinch_site_rmat'))

FREEPROP_OBSERVABLES = ObservableNames(
    prop_pose=('position', 'orientation', 'linear_velocity',
               'angular_velocity'))


def make_options(obs_settings: ObservationSettings,
                 obs_names: ObservableNames):
  """{observable_name: configure-kwargs} for a named observable group."""
  return {
      name: getattr(obs_settings, category)._asdict()
      for category in CATEGORIES
      for name in getattr(obs_names, category)
  }
