"""Finger domain (behavioural parity: reference suite/finger.py).

Note: the reference model requests elliptic friction cones; this build
solves with pyramidal cones (elliptic lands with the solver upgrade),
which preserves task semantics though contact forces differ slightly.
"""

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
_EASY_TARGET_SIZE = 0.07
_HARD_TARGET_SIZE = 0.03
_INITIAL_SPIN_VELOCITY = 100
_STOP_VELOCITY = 1e-6
_SPIN_VELOCITY = 15.0
SUITE = containers.TaggedTasks()


def make_model() -> str:
  """Reference model asset, verbatim (suite/assets/finger.xml)."""
  return common.read_model('finger.xml')


@SUITE.add('benchmarking')
def spin(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
  """Returns the Spin task."""
  model = models.from_xml_string(make_model(), assets=common.ASSETS)
  # spin variant reduces the hinge damping (reference finger.py:142)
  hinge_dof = model.jnt_dofadr[model.names.name2id('joint', 'hinge')]
  damping = np.array(model.dof_damping)
  damping[hinge_dof] = .03
  model = model.replace(dof_damping=damping)
  task = Spin(model)
  environment_kwargs = environment_kwargs or {}
  return control.Environment(
      model, task, time_limit=time_limit,
      control_timestep=_CONTROL_TIMESTEP, seed=random,
      **environment_kwargs)


@SUITE.add('benchmarking')
def turn_easy(time_limit=_DEFAULT_TIME_LIMIT, random=None,
              environment_kwargs=None):
  """Returns the easy Turn task."""
  return _turn(_EASY_TARGET_SIZE, time_limit, random,
               environment_kwargs)


@SUITE.add('benchmarking')
def turn_hard(time_limit=_DEFAULT_TIME_LIMIT, random=None,
              environment_kwargs=None):
  """Returns the hard Turn task."""
  return _turn(_HARD_TARGET_SIZE, time_limit, random,
               environment_kwargs)


def _turn(target_radius, time_limit, random, environment_kwargs):
  model = models.from_xml_string(make_model(), assets=common.ASSETS)
  sid = model.names.name2id('site', 'target')
  size = np.array(model.site_size)
  size[sid, 0] = target_radius
  model = model.replace(site_size=size)
  task = Turn(model, target_radius=target_radius)
  environment_kwargs = environment_kwargs or {}
  return control.Environment(
      model, task, time_limit=time_limit,
      control_timestep=_CONTROL_TIMESTEP, seed=random,
      **environment_kwargs)


class _FingerTask(base.Task):

  def __init__(self, model):
    super().__init__(model)
    ss = self.sensor_slice
    self._s_pos = [ss('proximal'), ss('distal')]
    self._s_vel = [ss('proximal_velocity'), ss('distal_velocity'),
                   ss('hinge_velocity')]
    self._s_tip = ss('tip')
    self._s_target = ss('target')
    self._s_spinner = ss('spinner')
    self._s_touch = [ss('touchtop'), ss('touchbottom')]
    self._target_site = self.site_id('target')

  def _random_joint_angles(self, model, data, rng):
    """Collision-free random joint configuration (traced loop)."""

    def sample(key):
      qpos = base.random_limited_qpos(model, key)
      d = data.replace(qpos=qpos)
      d = smooth.kinematics(model, d)
      d = coll_ops.collision(model, d)
      return qpos, jnp.sum(d.contact.active.astype(jnp.int32))

    def cond(carry):
      _, _, n, it = carry
      return (n > 0) & (it < 64)

    def body(carry):
      key, _, _, it = carry
      key, sub = jax.random.split(key)
      q, n = sample(sub)
      return key, q, n, it + 1

    k0, s0 = jax.random.split(rng)
    q0, n0 = sample(s0)
    _, qpos, _, _ = jax.lax.while_loop(cond, body, (k0, q0, n0, 0))
    return qpos

  # ---- observation pieces (all from sensordata, like the reference) --
  def _xz(self, data, sl):
    v = data.sensordata[sl]
    return jnp.stack([v[0], v[2]])

  def _tip_position(self, data):
    return self._xz(data, self._s_tip) - self._xz(data, self._s_spinner)

  def _target_position(self, data):
    return (self._xz(data, self._s_target) -
            self._xz(data, self._s_spinner))

  def _dist_to_target(self, model, data):
    to_target = self._target_position(data) - self._tip_position(data)
    return (jnp.linalg.norm(to_target) -
            jnp.asarray(model.site_size)[self._target_site, 0])

  def _base_obs(self, data):
    obs = collections.OrderedDict()
    obs['position'] = jnp.concatenate(
        [data.sensordata[self._s_pos[0]],
         data.sensordata[self._s_pos[1]], self._tip_position(data)])
    obs['velocity'] = jnp.concatenate(
        [data.sensordata[s] for s in self._s_vel])
    obs['touch'] = jnp.log1p(jnp.concatenate(
        [data.sensordata[s] for s in self._s_touch]))
    return obs


class Spin(_FingerTask):
  """Spin the free body counter-clockwise."""

  def initialize_episode(self, model, data, rng):
    return data.replace(qpos=self._random_joint_angles(model, data,
                                                       rng))

  def get_observation(self, model, data):
    return self._base_obs(data)

  def get_reward(self, model, data):
    hinge_vel = data.sensordata[self._s_vel[2]][0]
    return (hinge_vel <= -_SPIN_VELOCITY).astype(data.qpos.dtype)


class Turn(_FingerTask):
  """Turn the body so its tip reaches a target angle."""

  def __init__(self, model, target_radius):
    super().__init__(model)
    self._target_radius = target_radius
    # hinge anchor is static: spinner body pos + joint pos
    hinge = model.names.name2id('joint', 'hinge')
    spinner_body = model.jnt_bodyid[hinge]
    self._hinge_anchor = (np.asarray(model.body_pos)[spinner_body] +
                          np.asarray(model.jnt_pos)[hinge])
    cap1 = self.geom_id('cap1')
    self._spinner_radius = float(
        np.asarray(model.geom_size)[cap1].sum())

  def randomize_model(self, model, rng):
    angle = jax.random.uniform(rng, (), minval=-np.pi, maxval=np.pi)
    x = self._hinge_anchor[0] + self._spinner_radius * jnp.sin(angle)
    z = self._hinge_anchor[2] + self._spinner_radius * jnp.cos(angle)
    site_pos = jnp.asarray(model.site_pos)
    site_pos = site_pos.at[self._target_site, 0].set(x)
    site_pos = site_pos.at[self._target_site, 2].set(z)
    return model.replace(site_pos=site_pos)

  def initialize_episode(self, model, data, rng):
    return data.replace(qpos=self._random_joint_angles(model, data,
                                                       rng))

  def get_observation(self, model, data):
    obs = self._base_obs(data)
    obs['target_position'] = self._target_position(data)
    obs['dist_to_target'] = self._dist_to_target(model, data)
    return obs

  def get_reward(self, model, data):
    return (self._dist_to_target(model, data) <= 0).astype(
        data.qpos.dtype)
