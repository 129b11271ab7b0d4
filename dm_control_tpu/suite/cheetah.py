"""Cheetah domain (behavioural parity: reference suite/cheetah.py)."""

import collections

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu import models
from dm_control_tpu.ops import forward as forward_ops
from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite import common
from dm_control_tpu.utils import containers
from dm_control_tpu.utils import rewards

_DEFAULT_TIME_LIMIT = 10
_RUN_SPEED = 10
SUITE = containers.TaggedTasks()


def make_model() -> str:
  """Reference model asset, verbatim (suite/assets/cheetah.xml)."""
  return common.read_model('cheetah.xml')


@SUITE.add('benchmarking')
def run(time_limit=_DEFAULT_TIME_LIMIT, random=None,
        environment_kwargs=None):
  """Returns the run task."""
  model = models.from_xml_string(make_model(), assets=common.ASSETS)
  task = Cheetah(model)
  environment_kwargs = environment_kwargs or {}
  return control.Environment(model, task, time_limit=time_limit,
                             seed=random, **environment_kwargs)


class Cheetah(base.Task):
  """Run forward fast."""

  def __init__(self, model):
    super().__init__(model)
    self._speed_slice = self.sensor_slice('torso_subtreelinvel')

  def initialize_episode(self, model, data, rng):
    qpos = base.random_limited_qpos_only_limited(model, rng)
    data = data.replace(qpos=qpos)
    # settle for 200 steps before starting the episode (reference
    # cheetah.py:69-74), then restart the clock
    def body(d, _):
      return forward_ops.step(model, d), ()
    data, _ = jax.lax.scan(body, data, None, length=200)
    return data.replace(time=jnp.zeros((), data.qpos.dtype))

  def get_observation(self, model, data):
    obs = collections.OrderedDict()
    obs['position'] = data.qpos[1:]
    obs['velocity'] = data.qvel
    return obs

  def get_reward(self, model, data):
    return rewards.tolerance(
        data.sensordata[self._speed_slice][0],
        bounds=(_RUN_SPEED, float('inf')), margin=_RUN_SPEED,
        value_at_margin=0, sigmoid='linear')
