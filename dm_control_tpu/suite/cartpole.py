"""Cartpole domain (behavioural parity: reference suite/cartpole.py)."""

import collections
from xml.etree import ElementTree as etree

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


def make_model(n_poles: int = 1) -> str:
  """Reference cartpole.xml, with extra poles chained procedurally
  (reference suite/cartpole.py:105-128 `_make_model`)."""
  xml_string = common.read_model('cartpole.xml')
  if n_poles == 1:
    return xml_string
  mjcf = etree.fromstring(xml_string)
  parent = mjcf.find('./worldbody/body/body')   # first pole
  for pole_index in range(2, n_poles + 1):
    child = etree.Element('body', name=f'pole_{pole_index}',
                          pos='0 0 1', childclass='pole')
    etree.SubElement(child, 'joint', name=f'hinge_{pole_index}')
    etree.SubElement(child, 'geom', name=f'pole_{pole_index}')
    parent.append(child)
    parent = child
  # lower the floor and pull the cameras back to fit the longer pole
  floor = mjcf.find('./worldbody/geom')
  floor.set('pos', '0 0 {}'.format(1 - n_poles - .05))
  cameras = mjcf.findall('./worldbody/camera')
  cameras[0].set('pos', '0 {} 1'.format(-1 - 2 * n_poles))
  cameras[1].set('pos', '0 {} 2'.format(-2 * n_poles))
  return etree.tostring(mjcf, encoding='unicode')



def _make_env(swing_up, sparse, n_poles=1, time_limit=_DEFAULT_TIME_LIMIT,
              random=None, environment_kwargs=None):
  model = models.from_xml_string(make_model(n_poles), assets=common.ASSETS)
  task = Balance(model, swing_up=swing_up, sparse=sparse)
  environment_kwargs = environment_kwargs or {}
  return control.Environment(model, task, time_limit=time_limit,
                             seed=random, **environment_kwargs)


@SUITE.add('benchmarking')
def balance(time_limit=_DEFAULT_TIME_LIMIT, random=None,
            environment_kwargs=None):
  """Returns the Cartpole Balance task."""
  return _make_env(False, False, 1, time_limit, random,
                   environment_kwargs)


@SUITE.add('benchmarking')
def balance_sparse(time_limit=_DEFAULT_TIME_LIMIT, random=None,
                   environment_kwargs=None):
  """Returns the sparse reward variant of the Cartpole Balance task."""
  return _make_env(False, True, 1, time_limit, random,
                   environment_kwargs)


@SUITE.add('benchmarking')
def swingup(time_limit=_DEFAULT_TIME_LIMIT, random=None,
            environment_kwargs=None):
  """Returns the Cartpole Swing-Up task."""
  return _make_env(True, False, 1, time_limit, random,
                   environment_kwargs)


@SUITE.add('benchmarking')
def swingup_sparse(time_limit=_DEFAULT_TIME_LIMIT, random=None,
                   environment_kwargs=None):
  """Returns the sparse reward variant of the Cartpole Swing-Up task."""
  return _make_env(True, True, 1, time_limit, random,
                   environment_kwargs)


@SUITE.add()
def two_poles(time_limit=_DEFAULT_TIME_LIMIT, random=None,
              environment_kwargs=None):
  """Returns the Cartpole Balance task with two poles."""
  return _make_env(True, False, 2, time_limit, random,
                   environment_kwargs)


@SUITE.add()
def three_poles(time_limit=_DEFAULT_TIME_LIMIT, random=None,
                environment_kwargs=None):
  """Returns the Cartpole Balance task with three poles."""
  return _make_env(True, False, 3, time_limit, random,
                   environment_kwargs)


class Balance(base.Task):
  """Balance / swing up the pole(s) (reference cartpole.py:151-244)."""

  _CART_RANGE = (-.25, .25)
  _ANGLE_COSINE_RANGE = (.995, 1)

  def __init__(self, model, swing_up: bool, sparse: bool):
    super().__init__(model)
    self._sparse = sparse
    self._swing_up = swing_up
    self._slider_q = self.joint_qposadr('slider')
    # pole bodies are every body from index 2 on (world=0, cart=1)
    self._poles = list(range(2, model.nbody))

  def initialize_episode(self, model, data, rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    nv = model.nv
    qpos = data.qpos
    dtype = qpos.dtype
    if self._swing_up:
      qpos = qpos.at[0].set(
          .01 * jax.random.normal(k1, dtype=dtype))
      qpos = qpos.at[1].set(
          np.pi + .01 * jax.random.normal(k2, dtype=dtype))
      if nv > 2:
        rest = .1 * jax.random.normal(k3, (nv - 2,), dtype=dtype)
        qpos = qpos.at[2:].set(rest)
      kv = jax.random.split(k3)[0]
    else:
      qpos = qpos.at[0].set(
          jax.random.uniform(k1, (), dtype, -.1, .1))
      qpos = qpos.at[1:].set(
          jax.random.uniform(k2, (nv - 1,), dtype, -.034, .034))
      kv = k3
    qvel = .01 * jax.random.normal(kv, (nv,), dtype=dtype)
    return data.replace(qpos=qpos, qvel=qvel)

  # ---------------- obs / reward ----------------
  def _pole_angle_cosine(self, data):
    return jnp.stack([data.xmat[b, 2, 2] for b in self._poles])

  def get_observation(self, model, data):
    obs = collections.OrderedDict()
    zz_xz = jnp.stack(
        [jnp.stack([data.xmat[b, 2, 2], data.xmat[b, 0, 2]])
         for b in self._poles]).ravel()
    obs['position'] = jnp.concatenate(
        [data.qpos[self._slider_q:self._slider_q + 1], zz_xz])
    obs['velocity'] = data.qvel
    return obs

  def get_reward(self, model, data):
    cart_position = data.qpos[self._slider_q]
    if self._sparse:
      cart_in_bounds = rewards.tolerance(cart_position,
                                         self._CART_RANGE)
      angle_in_bounds = jnp.prod(rewards.tolerance(
          self._pole_angle_cosine(data), self._ANGLE_COSINE_RANGE))
      return cart_in_bounds * angle_in_bounds
    upright = (self._pole_angle_cosine(data) + 1) / 2
    centered = rewards.tolerance(cart_position, margin=2)
    centered = (1 + centered) / 2
    small_control = rewards.tolerance(
        data.ctrl, margin=1, value_at_margin=0, sigmoid='quadratic')[0]
    small_control = (4 + small_control) / 5
    small_velocity = jnp.min(rewards.tolerance(data.qvel[1:], margin=5))
    small_velocity = (1 + small_velocity) / 2
    return jnp.mean(upright) * small_control * small_velocity * centered
