"""Fish domain (behavioural parity: reference suite/fish.py)."""

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

_DEFAULT_TIME_LIMIT = 40
_CONTROL_TIMESTEP = .04
_JOINTS = ['tail1', 'tail_twist', 'tail2', 'finright_roll',
           'finright_pitch', 'finleft_roll', 'finleft_pitch']
SUITE = containers.TaggedTasks()


def make_model() -> str:
  """Reference model asset, verbatim (suite/assets/fish.xml)."""
  return common.read_model('fish.xml')


def _make_env(task_cls, time_limit, random, environment_kwargs):
  model = models.from_xml_string(make_model(), assets=common.ASSETS)
  task = task_cls(model)
  environment_kwargs = environment_kwargs or {}
  return control.Environment(
      model, task, control_timestep=_CONTROL_TIMESTEP,
      time_limit=time_limit, seed=random, **environment_kwargs)


@SUITE.add('benchmarking')
def upright(time_limit=_DEFAULT_TIME_LIMIT, random=None,
            environment_kwargs=None):
  """Returns the Fish Upright task."""
  return _make_env(Upright, time_limit, random, environment_kwargs)


@SUITE.add('benchmarking')
def swim(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
  """Returns the Fish Swim task."""
  return _make_env(Swim, time_limit, random, environment_kwargs)


class _FishTask(base.Task):

  def __init__(self, model):
    super().__init__(model)
    self._torso = self.body_id('torso')
    self._mouth = self.geom_id('mouth')
    self._target = self.geom_id('target')
    self._joint_q = [self.joint_qposadr(j) for j in _JOINTS]
    self._root_q = self.joint_qposadr('root')

  def _random_pose(self, model, data, rng):
    k1, k2 = jax.random.split(rng)
    quat = jax.random.normal(k1, (4,), dtype=data.qpos.dtype)
    quat = quat / jnp.maximum(jnp.linalg.norm(quat), 1e-12)
    qpos = jnp.asarray(data.qpos)
    qpos = qpos.at[self._root_q + 3:self._root_q + 7].set(quat)
    angles = jax.random.uniform(k2, (len(self._joint_q),),
                                data.qpos.dtype, -.2, .2)
    for i, adr in enumerate(self._joint_q):
      qpos = qpos.at[adr].set(angles[i])
    return data.replace(qpos=qpos)

  def _upright(self, data):
    return data.xmat[self._torso, 2, 2]

  def _joint_angles(self, data):
    return jnp.stack([data.qpos[a] for a in self._joint_q])


class Upright(_FishTask):
  """Right the fish."""

  def initialize_episode(self, model, data, rng):
    return self._random_pose(model, data, rng)

  def get_observation(self, model, data):
    obs = collections.OrderedDict()
    obs['joint_angles'] = self._joint_angles(data)
    obs['upright'] = self._upright(data)
    obs['velocity'] = data.qvel
    return obs

  def get_reward(self, model, data):
    return rewards.tolerance(self._upright(data), bounds=(1, 1),
                             margin=1)


class Swim(_FishTask):
  """Swim to the target."""

  def randomize_model(self, model, rng):
    k1, k2 = jax.random.split(rng)
    xy = jax.random.uniform(k1, (2,), minval=-.4, maxval=.4)
    z = jax.random.uniform(k2, (), minval=.1, maxval=.3)
    geom_pos = jnp.asarray(model.geom_pos)
    geom_pos = geom_pos.at[self._target, 0:2].set(xy)
    geom_pos = geom_pos.at[self._target, 2].set(z)
    return model.replace(geom_pos=geom_pos)

  def initialize_episode(self, model, data, rng):
    return self._random_pose(model, data, rng)

  def _mouth_to_target(self, data):
    dif = data.geom_xpos[self._target] - data.geom_xpos[self._mouth]
    return dif @ data.geom_xmat[self._mouth]

  def get_observation(self, model, data):
    obs = collections.OrderedDict()
    obs['joint_angles'] = self._joint_angles(data)
    obs['upright'] = self._upright(data)
    obs['target'] = self._mouth_to_target(data)
    obs['velocity'] = data.qvel
    return obs

  def get_reward(self, model, data):
    gsz = jnp.asarray(model.geom_size)
    radii = gsz[self._mouth, 0] + gsz[self._target, 0]
    in_target = rewards.tolerance(
        jnp.linalg.norm(self._mouth_to_target(data)),
        bounds=(0, radii), margin=2 * radii)
    is_upright = 0.5 * (self._upright(data) + 1)
    return (7 * in_target + is_upright) / 8
