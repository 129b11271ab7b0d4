"""Hopper domain (behavioural parity: reference suite/hopper.py)."""

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

_CONTROL_TIMESTEP = .02
_DEFAULT_TIME_LIMIT = 20
_STAND_HEIGHT = 0.6
_HOP_SPEED = 2
SUITE = containers.TaggedTasks()


def make_model() -> str:
  """Reference model asset, verbatim (suite/assets/hopper.xml)."""
  return common.read_model('hopper.xml')


def _make_env(hopping, time_limit, random, environment_kwargs):
  model = models.from_xml_string(make_model(), assets=common.ASSETS)
  task = Hopper(model, hopping=hopping)
  environment_kwargs = environment_kwargs or {}
  return control.Environment(
      model, task, time_limit=time_limit,
      control_timestep=_CONTROL_TIMESTEP, seed=random,
      **environment_kwargs)


@SUITE.add('benchmarking')
def stand(time_limit=_DEFAULT_TIME_LIMIT, random=None,
          environment_kwargs=None):
  """Returns a Hopper that strives to stand upright."""
  return _make_env(False, time_limit, random, environment_kwargs)


@SUITE.add('benchmarking')
def hop(time_limit=_DEFAULT_TIME_LIMIT, random=None,
        environment_kwargs=None):
  """Returns a Hopper that strives to hop forward."""
  return _make_env(True, time_limit, random, environment_kwargs)


class Hopper(base.Task):
  """Stand upright or hop forward."""

  def __init__(self, model, hopping: bool):
    super().__init__(model)
    self._hopping = hopping
    self._torso = self.body_id('torso')
    self._foot = self.body_id('foot')
    self._speed_slice = self.sensor_slice('torso_subtreelinvel')
    self._touch_toe = self.sensor_slice('touch_toe')
    self._touch_heel = self.sensor_slice('touch_heel')

  def initialize_episode(self, model, data, rng):
    qpos = base.random_limited_qpos(model, rng)
    return data.replace(qpos=qpos)

  def _height(self, data):
    return data.xipos[self._torso, 2] - data.xipos[self._foot, 2]

  def _speed(self, data):
    return data.sensordata[self._speed_slice][0]

  def get_observation(self, model, data):
    obs = collections.OrderedDict()
    obs['position'] = data.qpos[1:]
    obs['velocity'] = data.qvel
    obs['touch'] = jnp.log1p(jnp.concatenate(
        [data.sensordata[self._touch_toe],
         data.sensordata[self._touch_heel]]))
    return obs

  def get_reward(self, model, data):
    standing = rewards.tolerance(self._height(data), (_STAND_HEIGHT, 2))
    if self._hopping:
      hopping = rewards.tolerance(self._speed(data),
                                  bounds=(_HOP_SPEED, float('inf')),
                                  margin=_HOP_SPEED / 2,
                                  value_at_margin=0.5,
                                  sigmoid='linear')
      return standing * hopping
    small_control = jnp.mean(rewards.tolerance(
        data.ctrl, margin=1, value_at_margin=0, sigmoid='quadratic'))
    small_control = (small_control + 4) / 5
    return standing * small_control
