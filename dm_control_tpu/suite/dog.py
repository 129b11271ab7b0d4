"""Dog domain (behavioural parity: reference suite/dog.py).

The model is the reference dog.xml verbatim (suite/assets/, 162 bone
meshes whose density-derived inertia defines the body masses), with the
same element-removal patching as the reference make_model (reference
suite/dog.py:61-94). Tasks: stand / walk / trot / run (ball removed)
and fetch (ball + target kept). Rewards are the reference's factored
products (suite/dog.py:317-460) expressed as jnp so the whole inner
loop stays one jitted function.
"""

import collections
from xml.etree import ElementTree as etree

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu import models
from dm_control_tpu.models import constants
from dm_control_tpu.models import types
from dm_control_tpu.ops import sensor as sensor_ops
from dm_control_tpu.ops import smooth
from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite import common
from dm_control_tpu.utils import containers
from dm_control_tpu.utils import rewards

_DEFAULT_TIME_LIMIT = 15
_CONTROL_TIMESTEP = .015

# Angle (deg) of local z from global z below which upright reward is 1
_MAX_UPRIGHT_ANGLE = 30
_MIN_UPRIGHT_COSINE = np.cos(np.deg2rad(_MAX_UPRIGHT_ANGLE))

# Standing reward is 1 above this fraction of the default-pose height
_STAND_HEIGHT_FRACTION = 0.9

_WALK_SPEED = 1
_TROT_SPEED = 3
_RUN_SPEED = 9

SUITE = containers.TaggedTasks()


def _remove(mjcf, tag, name):
  for parent in mjcf.iter():
    for child in list(parent):
      if child.tag == tag and child.get('name') == name:
        parent.remove(child)
        return
  raise ValueError(f'{tag} {name!r} not found')


def make_model(floor_size, remove_ball) -> str:
  """Reference dog.xml with floor resized and, for the non-fetch tasks,
  the ball/target/walls/cameras removed (reference suite/dog.py:61-86)."""
  mjcf = etree.fromstring(common.read_model('dog.xml'))
  floor = mjcf.find('.//geom[@name=\'floor\']')
  floor.set('size', f'{floor_size} {floor_size} .1')
  if remove_ball:
    _remove(mjcf, 'body', 'ball')
    _remove(mjcf, 'geom', 'target')
    _remove(mjcf, 'camera', 'ball')
    _remove(mjcf, 'camera', 'head')
    for wall in ['px', 'nx', 'py', 'ny']:
      _remove(mjcf, 'geom', 'wall_' + wall)
  return etree.tostring(mjcf, encoding='unicode')


def _load(floor_size=10, remove_ball=True):
  return models.from_xml_string(make_model(floor_size, remove_ball),
                                base_dir=common.ASSETS_DIR)


def _make_env(task_cls, floor_size, remove_ball, time_limit, random,
              environment_kwargs, **task_kwargs):
  model = _load(floor_size, remove_ball)
  task = task_cls(model, **task_kwargs)
  environment_kwargs = environment_kwargs or {}
  return control.Environment(
      model, task, time_limit=time_limit,
      control_timestep=_CONTROL_TIMESTEP, seed=random,
      **environment_kwargs)


@SUITE.add('no_reward_visualization')
def stand(time_limit=_DEFAULT_TIME_LIMIT, random=None,
          environment_kwargs=None):
  """Returns the Stand task."""
  return _make_env(Stand, _WALK_SPEED * _DEFAULT_TIME_LIMIT, True,
                   time_limit, random, environment_kwargs)


@SUITE.add('no_reward_visualization')
def walk(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
  """Returns the Walk task."""
  return _make_env(Move, _WALK_SPEED * _DEFAULT_TIME_LIMIT, True,
                   time_limit, random, environment_kwargs,
                   move_speed=_WALK_SPEED)


@SUITE.add('no_reward_visualization')
def trot(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
  """Returns the Trot task."""
  return _make_env(Move, _TROT_SPEED * _DEFAULT_TIME_LIMIT, True,
                   time_limit, random, environment_kwargs,
                   move_speed=_TROT_SPEED)


@SUITE.add('no_reward_visualization')
def run(time_limit=_DEFAULT_TIME_LIMIT, random=None,
        environment_kwargs=None):
  """Returns the Run task."""
  return _make_env(Move, _RUN_SPEED * _DEFAULT_TIME_LIMIT, True,
                   time_limit, random, environment_kwargs,
                   move_speed=_RUN_SPEED)


@SUITE.add('no_reward_visualization', 'hard')
def fetch(time_limit=_DEFAULT_TIME_LIMIT, random=None,
          environment_kwargs=None):
  """Returns the Fetch task."""
  return _make_env(Fetch, 10, False, time_limit, random,
                   environment_kwargs)


class Stand(base.Task):
  """A dog stand task generating upright posture
  (reference suite/dog.py:248-345)."""

  def __init__(self, model):
    super().__init__(model)
    self._torso = self.body_id('torso')
    self._pelvis = self.body_id('pelvis')
    self._skull = self.body_id('skull')
    self._root_q = self.joint_qposadr('root')
    self._root_v = self.joint_dofadr('root')
    self._hinge_q = [model.jnt_qposadr[j] for j in range(model.njnt)
                     if model.jnt_type[j] == constants.JointType.HINGE]
    self._hinge_v = [model.jnt_dofadr[j] for j in range(model.njnt)
                     if model.jnt_type[j] == constants.JointType.HINGE]
    self._linvel = self.sensor_slice('torso_linvel')
    self._inertial = [self.sensor_slice(n)
                      for n in ('accelerometer', 'velocimeter', 'gyro')]
    self._touch = [self.sensor_slice(n)
                   for n in ('palm_L', 'palm_R', 'sole_L', 'sole_R')]
    self._foot = [self.sensor_slice(n)
                  for n in ('foot_L', 'foot_R', 'hand_L', 'hand_R')]

    # default-pose stand heights (the reference measures them right
    # after physics.reset(), dog.py:275-277 — a model constant)
    cpu = jax.devices('cpu')[0]
    with jax.default_device(cpu):
      d0 = jax.jit(lambda: smooth.kinematics(
          model, types.make_data(model)))()
      z = np.asarray(jax.device_get(d0.xpos))[:, 2]
    self._stand_height = (_STAND_HEIGHT_FRACTION *
                          np.array([z[self._torso], z[self._pelvis]]))
    self._body_weight = float(
        -np.asarray(model.opt.gravity)[2] *
        np.asarray(model.body_subtreemass)[self._torso])

  def initialize_episode(self, model, data, rng):
    dtype = data.qpos.dtype
    ka, kv, kact = jax.random.split(rng, 3)
    azimuth = jax.random.uniform(ka, (), dtype, 0, 2 * np.pi)
    quat = jnp.stack([jnp.cos(azimuth / 2), jnp.zeros((), dtype),
                      jnp.zeros((), dtype), jnp.sin(azimuth / 2)])
    qpos = jnp.asarray(data.qpos)
    qpos = qpos.at[self._root_q + 3:self._root_q + 7].set(quat)
    qvel = jnp.asarray(data.qvel)
    rv = 2 * jax.random.normal(kv, (3,), dtype)
    qvel = qvel.at[0].set(rv[0]).at[1].set(rv[1]).at[5].set(rv[2])
    rng_act = jax.random.uniform(kact, (model.nu,), dtype)
    crange = jnp.asarray(model.actuator_ctrlrange, dtype)
    act = crange[:, 0] + rng_act * (crange[:, 1] - crange[:, 0])
    return data.replace(qpos=qpos, qvel=qvel, act=act)

  # -------- observation helpers (reference dog.py:162-213) --------

  def _z_projection(self, data):
    return jnp.stack([data.xmat[self._skull, 2],
                      data.xmat[self._torso, 2],
                      data.xmat[self._pelvis, 2]])

  def _torso_com_velocity(self, data):
    return data.sensordata[self._linvel] @ data.xmat[self._torso]

  def _torso_pelvis_height(self, data):
    return jnp.stack([data.xpos[self._torso, 2],
                      data.xpos[self._pelvis, 2]])

  def _touch_sum(self, data):
    return sum(jnp.sum(data.sensordata[s]) for s in self._touch)

  def get_observation(self, model, data):
    obs = collections.OrderedDict()
    obs['joint_angles'] = jnp.stack(
        [data.qpos[a] for a in self._hinge_q])
    obs['joint_velocites'] = jnp.stack(
        [data.qvel[a] for a in self._hinge_v])
    obs['torso_pelvis_height'] = self._torso_pelvis_height(data)
    obs['z_projection'] = self._z_projection(data).flatten()
    obs['torso_com_velocity'] = self._torso_com_velocity(data)
    obs['inertial_sensors'] = jnp.concatenate(
        [data.sensordata[s] for s in self._inertial])
    obs['foot_forces'] = jnp.concatenate(
        [data.sensordata[s] for s in self._foot])
    obs['touch_sensors'] = jnp.concatenate(
        [data.sensordata[s] for s in self._touch])
    obs['actuator_state'] = data.act
    return obs

  def _reward_factors(self, model, data):
    torso = rewards.tolerance(
        data.xpos[self._torso, 2],
        bounds=(self._stand_height[0], float('inf')),
        margin=self._stand_height[0])
    pelvis = rewards.tolerance(
        data.xpos[self._pelvis, 2],
        bounds=(self._stand_height[1], float('inf')),
        margin=self._stand_height[1])
    upright = rewards.tolerance(
        self._z_projection(data)[:, 2],
        bounds=(_MIN_UPRIGHT_COSINE, float('inf')),
        sigmoid='linear', margin=_MIN_UPRIGHT_COSINE + 1,
        value_at_margin=0)
    touch = rewards.tolerance(
        self._touch_sum(data),
        bounds=(self._body_weight, float('inf')),
        margin=self._body_weight, sigmoid='linear',
        value_at_margin=0.9)
    return jnp.concatenate([
        jnp.stack([torso, pelvis]), jnp.atleast_1d(upright),
        jnp.atleast_1d(touch)])

  def get_reward(self, model, data):
    return jnp.prod(self._reward_factors(model, data))


class Move(Stand):
  """A dog move task for generating locomotion
  (reference suite/dog.py:348-377)."""

  def __init__(self, model, move_speed):
    super().__init__(model)
    self._move_speed = move_speed

  def _reward_factors(self, model, data):
    standing = super()._reward_factors(model, data)
    speed_margin = max(1.0, self._move_speed)
    forward = rewards.tolerance(
        self._torso_com_velocity(data)[0],
        bounds=(self._move_speed, 2 * self._move_speed),
        margin=speed_margin, value_at_margin=0, sigmoid='linear')
    forward = (4 * forward + 1) / 5
    return jnp.concatenate([standing, jnp.atleast_1d(forward)])


class Fetch(Stand):
  """A dog fetch task to fetch a thrown ball
  (reference suite/dog.py:380-460)."""

  def __init__(self, model):
    super().__init__(model)
    self._ball_g = self.geom_id('ball')
    self._ball_b = model.geom_bodyid[self._ball_g]
    self._target_g = self.geom_id('target')
    self._floor_g = self.geom_id('floor')
    self._head_s = self.site_id('head')
    self._upper_bite = self.site_id('upper_bite')
    self._lower_bite = self.site_id('lower_bite')
    self._ball_q = self.joint_qposadr('ball_root')
    self._ball_v = self.joint_dofadr('ball_root')
    self._head_b = model.site_bodyid[self._head_s]

  def initialize_episode(self, model, data, rng):
    rng, r2 = jax.random.split(rng)
    data = super().initialize_episode(model, data, rng)
    dtype = data.qpos.dtype
    ka, kh, ks, kd = jax.random.split(r2, 4)
    radius = 0.75 * jnp.asarray(model.geom_size, dtype)[self._floor_g, 0]
    azimuth = jax.random.uniform(ka, (), dtype, 0, 2 * np.pi)
    position = jnp.stack([radius * jnp.sin(azimuth),
                          radius * jnp.cos(azimuth),
                          jnp.asarray(0.05, dtype)])
    qpos = jnp.asarray(data.qpos).at[
        self._ball_q:self._ball_q + 3].set(position)
    vertical_height = jax.random.uniform(kh, (), dtype, 0, 3)
    gravity = -model.opt.gravity[2]
    vertical_velocity = jnp.sqrt(2 * gravity * vertical_height)
    horizontal_speed = jax.random.uniform(ks, (), dtype, 0, 5)
    noise = 0.05 * jax.random.normal(kd, (2,), dtype)
    direction = jnp.stack([-jnp.sin(azimuth) + noise[0],
                           -jnp.cos(azimuth) + noise[1]])
    velocity = jnp.concatenate([horizontal_speed * direction,
                                vertical_velocity[None]])
    qvel = jnp.asarray(data.qvel).at[
        self._ball_v:self._ball_v + 3].set(velocity)
    return data.replace(qpos=qpos, qvel=qvel)

  def _ball_in_head_frame(self, data):
    head_frame = data.site_xmat[self._head_s]
    head_to_ball = (data.geom_xpos[self._ball_g] -
                    data.site_xpos[self._head_s])
    _, head_vel = sensor_ops._object_velocity(
        self._model, data, data.site_xpos[self._head_s], self._head_b)
    _, ball_vel = sensor_ops._object_velocity(
        self._model, data, data.geom_xpos[self._ball_g], self._ball_b)
    rel_vel = ball_vel - head_vel
    return jnp.concatenate([head_to_ball @ head_frame,
                            rel_vel @ head_frame])

  def _ball_to_mouth_distance(self, data):
    ball = data.geom_xpos[self._ball_g]
    up = jnp.linalg.norm(ball - data.site_xpos[self._upper_bite])
    lo = jnp.linalg.norm(ball - data.site_xpos[self._lower_bite])
    return 0.5 * (up + lo)

  def _ball_to_target_distance(self, data):
    return jnp.linalg.norm(data.geom_xpos[self._ball_g] -
                           data.geom_xpos[self._target_g])

  def get_observation(self, model, data):
    obs = super().get_observation(model, data)
    obs['ball_state'] = self._ball_in_head_frame(data)
    head_frame = data.site_xmat[self._head_s]
    head_to_target = (data.geom_xpos[self._target_g] -
                      data.site_xpos[self._head_s])
    obs['target_position'] = head_to_target @ head_frame
    return obs

  def _reward_factors(self, model, data):
    standing = super()._reward_factors(model, data)
    bite_radius = jnp.asarray(model.site_size)[self._upper_bite, 0]
    reach_ball = rewards.tolerance(
        self._ball_to_mouth_distance(data),
        bounds=(0, bite_radius), sigmoid='reciprocal', margin=2)
    reach_ball = (6 * reach_ball + 1) / 7
    target_radius = jnp.asarray(model.geom_size)[self._target_g, 0]
    bring_margin = jnp.asarray(model.geom_size)[self._floor_g, 0]
    ball_near_target = rewards.tolerance(
        self._ball_to_target_distance(data),
        bounds=(0, target_radius), sigmoid='reciprocal',
        margin=bring_margin)
    fetch_ball = (ball_near_target + 1) / 2
    # let go of the ball once fetched
    reach_ball = jnp.where(
        self._ball_to_target_distance(data) < 2 * target_radius,
        1.0, reach_ball)
    return jnp.concatenate([standing, jnp.atleast_1d(reach_ball),
                            jnp.atleast_1d(fetch_ball)])
