"""Pendulum domain (behavioural parity: reference suite/pendulum.py)."""

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
_ANGLE_BOUND = 8
_COSINE_BOUND = np.cos(np.deg2rad(_ANGLE_BOUND))
SUITE = containers.TaggedTasks()


def make_model() -> str:
  """Reference model asset, verbatim (suite/assets/pendulum.xml)."""
  return common.read_model('pendulum.xml')


@SUITE.add('benchmarking')
def swingup(time_limit=_DEFAULT_TIME_LIMIT, random=None,
            environment_kwargs=None):
  """Returns pendulum swingup task."""
  model = models.from_xml_string(make_model(), assets=common.ASSETS)
  task = SwingUp(model)
  environment_kwargs = environment_kwargs or {}
  return control.Environment(model, task, time_limit=time_limit,
                             seed=random, **environment_kwargs)


class SwingUp(base.Task):
  """Swing up and balance the pole."""

  def __init__(self, model):
    super().__init__(model)
    self._pole = self.body_id('pole')
    self._hinge_q = self.joint_qposadr('hinge')
    self._hinge_v = self.joint_dofadr('hinge')

  def initialize_episode(self, model, data, rng):
    angle = jax.random.uniform(rng, (), minval=-np.pi, maxval=np.pi,
                               dtype=data.qpos.dtype)
    return data.replace(qpos=data.qpos.at[self._hinge_q].set(angle))

  def get_observation(self, model, data):
    obs = collections.OrderedDict()
    xmat = data.xmat[self._pole]
    obs['orientation'] = jnp.stack([xmat[2, 2], xmat[0, 2]])
    obs['velocity'] = data.qvel[self._hinge_v:self._hinge_v + 1]
    return obs

  def get_reward(self, model, data):
    return rewards.tolerance(data.xmat[self._pole, 2, 2],
                             (_COSINE_BOUND, 1))
