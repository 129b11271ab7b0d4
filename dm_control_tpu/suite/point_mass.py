"""Point-mass domain (behavioural parity: reference suite/point_mass.py)."""

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
SUITE = containers.TaggedTasks()


def make_model() -> str:
  """Reference model asset, verbatim (suite/assets/point_mass.xml)."""
  return common.read_model('point_mass.xml')


@SUITE.add('benchmarking', 'easy')
def easy(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
  """Returns the easy point_mass task."""
  model = models.from_xml_string(make_model(), assets=common.ASSETS)
  task = PointMass(model, randomize_gains=False)
  environment_kwargs = environment_kwargs or {}
  return control.Environment(model, task, time_limit=time_limit,
                             seed=random, **environment_kwargs)


@SUITE.add()
def hard(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
  """Returns the hard point_mass task (randomized actuation gains)."""
  model = models.from_xml_string(make_model(), assets=common.ASSETS)
  task = PointMass(model, randomize_gains=True)
  environment_kwargs = environment_kwargs or {}
  return control.Environment(model, task, time_limit=time_limit,
                             seed=random, **environment_kwargs)


class PointMass(base.Task):
  """Reach the target; optionally with randomized control directions."""

  def __init__(self, model, randomize_gains: bool):
    super().__init__(model)
    self._randomize_gains = randomize_gains
    self._mass_geom = self.geom_id('pointmass')
    self._target_geom = self.geom_id('target')
    self._target_size = float(
        np.asarray(model.geom_size)[self._target_geom, 0])

  def randomize_model(self, model, rng):
    if not self._randomize_gains:
      return model
    k1, k2 = jax.random.split(rng)
    dir1 = jax.random.normal(k1, (2,))
    dir1 = dir1 / jnp.linalg.norm(dir1)
    # rejection-free "not too parallel": resample via rotation by a
    # uniform angle bounded away from 0 and pi
    ang = jax.random.uniform(k2, (), minval=np.arccos(0.9),
                             maxval=np.pi - np.arccos(0.9))
    rot = jnp.array([[jnp.cos(ang), -jnp.sin(ang)],
                     [jnp.sin(ang), jnp.cos(ang)]])
    dir2 = rot @ dir1
    wrap_prm = jnp.asarray(model.wrap_prm)
    wrap_prm = wrap_prm.at[0:2].set(dir1).at[2:4].set(dir2)
    return model.replace(wrap_prm=wrap_prm)

  def initialize_episode(self, model, data, rng):
    qpos = base.random_limited_qpos(model, rng)
    return data.replace(qpos=qpos)

  def get_observation(self, model, data):
    obs = collections.OrderedDict()
    obs['position'] = data.qpos
    obs['velocity'] = data.qvel
    return obs

  def get_reward(self, model, data):
    dist = jnp.linalg.norm(data.geom_xpos[self._target_geom] -
                           data.geom_xpos[self._mass_geom])
    near_target = rewards.tolerance(
        dist, bounds=(0, self._target_size), margin=self._target_size)
    control_reward = jnp.mean(rewards.tolerance(
        data.ctrl, margin=1, value_at_margin=0, sigmoid='quadratic'))
    small_control = (control_reward + 4) / 5
    return near_target * small_control
