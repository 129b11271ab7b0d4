"""Acrobot domain (behavioural parity: reference suite/acrobot.py)."""

import collections

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu import models
from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite import common
from dm_control_tpu.utils import containers
from dm_control_tpu.utils import rewards

_DEFAULT_TIME_LIMIT = 10
SUITE = containers.TaggedTasks()


def make_model() -> str:
  """Reference model asset, verbatim (suite/assets/acrobot.xml)."""
  return common.read_model('acrobot.xml')


def _make_env(sparse, time_limit, random, environment_kwargs):
  model = models.from_xml_string(make_model(), assets=common.ASSETS)
  task = Balance(model, sparse=sparse)
  environment_kwargs = environment_kwargs or {}
  return control.Environment(model, task, time_limit=time_limit,
                             seed=random, **environment_kwargs)


@SUITE.add('benchmarking')
def swingup(time_limit=_DEFAULT_TIME_LIMIT, random=None,
            environment_kwargs=None):
  """Returns Acrobot balance task."""
  return _make_env(False, time_limit, random, environment_kwargs)


@SUITE.add('benchmarking')
def swingup_sparse(time_limit=_DEFAULT_TIME_LIMIT, random=None,
                   environment_kwargs=None):
  """Returns Acrobot sparse balance."""
  return _make_env(True, time_limit, random, environment_kwargs)


class Balance(base.Task):
  """Swing up and balance the acrobot."""

  def __init__(self, model, sparse: bool):
    super().__init__(model)
    self._sparse = sparse
    self._arms = [self.body_id('upper_arm'), self.body_id('lower_arm')]
    self._target = self.site_id('target')
    self._tip = self.site_id('tip')
    self._target_radius = float(np.asarray(model.site_size)[
        self._target, 0])

  def initialize_episode(self, model, data, rng):
    angles = jax.random.uniform(rng, (2,), data.qpos.dtype,
                                -np.pi, np.pi)
    return data.replace(qpos=angles)

  def get_observation(self, model, data):
    obs = collections.OrderedDict()
    horizontal = jnp.stack([data.xmat[b, 0, 2] for b in self._arms])
    vertical = jnp.stack([data.xmat[b, 2, 2] for b in self._arms])
    obs['orientations'] = jnp.concatenate([horizontal, vertical])
    obs['velocity'] = data.qvel
    return obs

  def get_reward(self, model, data):
    to_target = jnp.linalg.norm(
        data.site_xpos[self._target] - data.site_xpos[self._tip])
    return rewards.tolerance(
        to_target, bounds=(0, self._target_radius),
        margin=0 if self._sparse else 1)
