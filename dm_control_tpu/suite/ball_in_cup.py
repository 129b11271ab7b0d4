"""Ball-in-cup domain (behavioural parity: reference suite/ball_in_cup.py)."""

import collections

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu import models
from dm_control_tpu.ops import collision as coll_ops
from dm_control_tpu.ops import smooth
from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite import common
from dm_control_tpu.utils import containers

_DEFAULT_TIME_LIMIT = 20
_CONTROL_TIMESTEP = .02
SUITE = containers.TaggedTasks()


def make_model() -> str:
  """Reference model asset, verbatim (suite/assets/ball_in_cup.xml)."""
  return common.read_model('ball_in_cup.xml')


@SUITE.add('benchmarking', 'easy')
def catch(time_limit=_DEFAULT_TIME_LIMIT, random=None,
          environment_kwargs=None):
  """Returns the Ball-in-Cup task."""
  model = models.from_xml_string(make_model(), assets=common.ASSETS)
  task = BallInCup(model)
  environment_kwargs = environment_kwargs or {}
  return control.Environment(
      model, task, time_limit=time_limit,
      control_timestep=_CONTROL_TIMESTEP, seed=random,
      **environment_kwargs)


class BallInCup(base.Task):
  """Swing the ball into the cup (sparse reward)."""

  def __init__(self, model):
    super().__init__(model)
    self._ball_body = self.body_id('ball')
    self._ball_geom = self.geom_id('ball')
    self._target_site = self.site_id('target')
    self._ball_x = self.joint_qposadr('ball_x')
    self._ball_z = self.joint_qposadr('ball_z')

  def initialize_episode(self, model, data, rng):
    """Collision-free random ball position (traced rejection loop)."""

    def sample(key):
      kx, kz = jax.random.split(key)
      qpos = jnp.asarray(data.qpos)
      qpos = qpos.at[self._ball_x].set(
          jax.random.uniform(kx, (), data.qpos.dtype, -.2, .2))
      qpos = qpos.at[self._ball_z].set(
          jax.random.uniform(kz, (), data.qpos.dtype, .2, .5))
      d = data.replace(qpos=qpos)
      d = smooth.kinematics(model, d)
      d = coll_ops.collision(model, d)
      return qpos, jnp.sum(d.contact.active.astype(jnp.int32))

    def cond(carry):
      _, _, ncon, it = carry
      return (ncon > 0) & (it < 64)

    def body(carry):
      key, _, _, it = carry
      key, sub = jax.random.split(key)
      q, n = sample(sub)
      return key, q, n, it + 1

    key0, sub0 = jax.random.split(rng)
    q0, n0 = sample(sub0)
    _, qpos, _, _ = jax.lax.while_loop(cond, body, (key0, q0, n0, 0))
    return data.replace(qpos=qpos)

  def get_observation(self, model, data):
    obs = collections.OrderedDict()
    obs['position'] = data.qpos
    obs['velocity'] = data.qvel
    return obs

  def get_reward(self, model, data):
    # 1 if the ball is inside the target box of the cup
    target = data.site_xpos[self._target_site][jnp.array([0, 2])]
    ball = data.xpos[self._ball_body][jnp.array([0, 2])]
    size = jnp.asarray(model.site_size)[self._target_site][
        jnp.array([0, 2])]
    ball_size = jnp.asarray(model.geom_size)[self._ball_geom, 0]
    inside = jnp.all(jnp.abs(target - ball) < size - ball_size)
    return inside.astype(data.qpos.dtype)
