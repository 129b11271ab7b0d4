"""Shared configuration options for observations
(reference manipulation/shared/observations.py:15-118)."""

import collections

import numpy as np


class ObservableSpec(collections.namedtuple(
    'ObservableSpec',
    ['enabled', 'update_interval', 'buffer_size', 'delay', 'aggregator',
     'corruptor'])):
  """Configuration options for generic observables."""
  __slots__ = ()


class CameraObservableSpec(collections.namedtuple(
    'CameraObservableSpec', ('height', 'width') + ObservableSpec._fields)):
  """Configuration options for camera observables."""
  __slots__ = ()


class ObservationSettings(collections.namedtuple(
    'ObservationSettings', ['proprio', 'ftt', 'prop_pose', 'camera'])):
  """Container of `ObservableSpecs` grouped by category."""
  __slots__ = ()


class ObservableNames(collections.namedtuple(
    'ObservableNames', ['proprio', 'ftt', 'prop_pose', 'camera'])):
  """Container that groups the names of observables by category."""
  __slots__ = ()

  def __new__(cls, proprio=(), ftt=(), prop_pose=(), camera=()):
    return super().__new__(cls, proprio=proprio, ftt=ftt,
                           prop_pose=prop_pose, camera=camera)


_DISABLED_FEATURE = ObservableSpec(
    enabled=False, update_interval=1, buffer_size=1, delay=0,
    aggregator=None, corruptor=None)
_ENABLED_FEATURE = _DISABLED_FEATURE._replace(enabled=True)

# force/torque/touch readings pass through a symmetric log transform
_symlog1p = lambda x, random_state: np.sign(x) * np.log1p(abs(x))
_DISABLED_FTT = _DISABLED_FEATURE._replace(corruptor=_symlog1p)
_ENABLED_FTT = _ENABLED_FEATURE._replace(corruptor=_symlog1p)

_DISABLED_CAMERA = CameraObservableSpec(
    height=84, width=84, enabled=False, update_interval=1,
    buffer_size=1, delay=0, aggregator=None, corruptor=None)
_ENABLED_CAMERA = _DISABLED_CAMERA._replace(enabled=True)

PERFECT_FEATURES = ObservationSettings(
    proprio=_ENABLED_FEATURE, ftt=_ENABLED_FTT,
    prop_pose=_ENABLED_FEATURE, camera=_DISABLED_CAMERA)

VISION = ObservationSettings(
    proprio=_ENABLED_FEATURE, ftt=_ENABLED_FTT,
    prop_pose=_DISABLED_FEATURE, camera=_ENABLED_CAMERA)

JACO_ARM_OBSERVABLES = ObservableNames(
    proprio=['joints_pos', 'joints_vel'], ftt=['joints_torque'])
JACO_HAND_OBSERVABLES = ObservableNames(
    proprio=['joints_pos', 'joints_vel', 'pinch_site_pos',
             'pinch_site_rmat'])
FREEPROP_OBSERVABLES = ObservableNames(
    prop_pose=['position', 'orientation', 'linear_velocity',
               'angular_velocity'])


def make_options(obs_settings, obs_names):
  """{observable_name: {option: value}} for a named observable set."""
  observable_options = {}
  for category, spec in obs_settings._asdict().items():
    for observable_name in getattr(obs_names, category):
      observable_options[observable_name] = spec._asdict()
  return observable_options
