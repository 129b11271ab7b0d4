"""Reacher domain (behavioural parity: reference suite/reacher.py)."""

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

_DEFAULT_TIME_LIMIT = 20
_BIG_TARGET = .05
_SMALL_TARGET = .015
SUITE = containers.TaggedTasks()


def make_model() -> str:
  """Reference model asset, verbatim (suite/assets/reacher.xml)."""
  return common.read_model('reacher.xml')


def _make_env(target_size, time_limit, random, environment_kwargs):
  model = models.from_xml_string(make_model(), assets=common.ASSETS)
  # bake the task's target size into the model
  gid = model.names.name2id('geom', 'target')
  geom_size = np.array(model.geom_size)
  geom_size[gid, 0] = target_size
  model = model.replace(geom_size=geom_size)
  task = Reacher(model, target_size=target_size)
  environment_kwargs = environment_kwargs or {}
  return control.Environment(model, task, time_limit=time_limit,
                             seed=random, **environment_kwargs)


@SUITE.add('benchmarking', 'easy')
def easy(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
  """Returns reacher with sparse reward and large target."""
  return _make_env(_BIG_TARGET, time_limit, random, environment_kwargs)


@SUITE.add('benchmarking')
def hard(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
  """Returns reacher with sparse reward and small target."""
  return _make_env(_SMALL_TARGET, time_limit, random,
                   environment_kwargs)


class Reacher(base.Task):
  """Reach the target with the finger."""

  def __init__(self, model, target_size: float):
    super().__init__(model)
    self._target_size = target_size
    self._target = self.geom_id('target')
    self._finger = self.geom_id('finger')

  def randomize_model(self, model, rng):
    k1, k2 = jax.random.split(rng)
    angle = jax.random.uniform(k1, (), minval=0, maxval=2 * np.pi)
    radius = jax.random.uniform(k2, (), minval=.05, maxval=.20)
    geom_pos = jnp.asarray(model.geom_pos)
    geom_pos = geom_pos.at[self._target, 0].set(
        radius * jnp.sin(angle))
    geom_pos = geom_pos.at[self._target, 1].set(
        radius * jnp.cos(angle))
    return model.replace(geom_pos=geom_pos)

  def initialize_episode(self, model, data, rng):
    qpos = base.random_limited_qpos(model, rng)
    return data.replace(qpos=qpos)

  def _finger_to_target(self, data):
    return (data.geom_xpos[self._target, :2] -
            data.geom_xpos[self._finger, :2])

  def get_observation(self, model, data):
    obs = collections.OrderedDict()
    obs['position'] = data.qpos
    obs['to_target'] = self._finger_to_target(data)
    obs['velocity'] = data.qvel
    return obs

  def get_reward(self, model, data):
    radii = (jnp.asarray(model.geom_size)[self._target, 0] +
             jnp.asarray(model.geom_size)[self._finger, 0])
    dist = jnp.linalg.norm(self._finger_to_target(data))
    return rewards.tolerance(dist, (0, radii))
