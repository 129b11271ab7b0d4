"""Quadruped domain (behavioural parity: reference suite/quadruped.py).

The model is the reference quadruped.xml verbatim (suite/assets/), with
the same element-removal patching as the reference make_model
(reference suite/quadruped.py:55-94). walk/run/fetch ship now; escape
lands with heightfield collision.
"""

import collections
from xml.etree import ElementTree as etree

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
from dm_control_tpu.utils import rewards

_DEFAULT_TIME_LIMIT = 20
_CONTROL_TIMESTEP = .02
_RUN_SPEED = 5
_WALK_SPEED = 0.5
_HEIGHTFIELD_ID = 0
_TERRAIN_SMOOTHNESS = 0.15   # 0.0: maximally bumpy; 1.0: smooth
_TERRAIN_BUMP_SCALE = 2      # spatial scale of terrain bumps (meters)
SUITE = containers.TaggedTasks()

_TOES = ['toe_front_left', 'toe_back_left', 'toe_back_right',
         'toe_front_right']
_WALLS = ['wall_px', 'wall_py', 'wall_nx', 'wall_ny']


def _remove(mjcf, tag, name):
  for parent in mjcf.iter():
    for child in list(parent):
      if child.tag == tag and child.get('name') == name:
        parent.remove(child)
        return
  raise ValueError(f'{tag} {name!r} not found')


def make_model(floor_size=None, terrain=False, rangefinders=False,
               walls_and_ball=False) -> str:
  """Reference quadruped.xml with unused elements removed
  (reference suite/quadruped.py:55-94 `make_model`)."""
  mjcf = etree.fromstring(common.read_model('quadruped.xml'))

  if floor_size is not None:
    floor_geom = mjcf.find('.//geom[@name=\'floor\']')
    floor_geom.set('size', f'{floor_size} {floor_size} .5')

  if not walls_and_ball:
    for wall in _WALLS:
      _remove(mjcf, 'geom', wall)
    _remove(mjcf, 'body', 'ball')
    _remove(mjcf, 'site', 'target')

  if not terrain:
    _remove(mjcf, 'geom', 'terrain')

  if not rangefinders:
    for sensor in mjcf.findall('sensor'):
      for rf in sensor.findall('rangefinder'):
        sensor.remove(rf)

  return etree.tostring(mjcf, encoding='unicode')


def _make_env(desired_speed, floor_size, time_limit, random,
              environment_kwargs):
  model = models.from_xml_string(make_model(floor_size=floor_size),
                                 assets=common.ASSETS)
  task = Move(model, desired_speed=desired_speed)
  environment_kwargs = environment_kwargs or {}
  return control.Environment(
      model, task, time_limit=time_limit,
      control_timestep=_CONTROL_TIMESTEP, seed=random,
      **environment_kwargs)


@SUITE.add()
def walk(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
  """Returns the Walk task."""
  return _make_env(_WALK_SPEED, _DEFAULT_TIME_LIMIT * _WALK_SPEED,
                   time_limit, random, environment_kwargs)


@SUITE.add()
def run(time_limit=_DEFAULT_TIME_LIMIT, random=None,
        environment_kwargs=None):
  """Returns the Run task."""
  return _make_env(_RUN_SPEED, _DEFAULT_TIME_LIMIT * _RUN_SPEED,
                   time_limit, random, environment_kwargs)


@SUITE.add()
def escape(time_limit=_DEFAULT_TIME_LIMIT, random=None,
           environment_kwargs=None):
  """Returns the Escape task."""
  model = models.from_xml_string(
      make_model(floor_size=40, terrain=True, rangefinders=True),
      assets=common.ASSETS)
  task = Escape(model)
  environment_kwargs = environment_kwargs or {}
  return control.Environment(
      model, task, time_limit=time_limit,
      control_timestep=_CONTROL_TIMESTEP, seed=random,
      **environment_kwargs)


@SUITE.add()
def fetch(time_limit=_DEFAULT_TIME_LIMIT, random=None,
          environment_kwargs=None):
  """Returns the Fetch task."""
  model = models.from_xml_string(make_model(walls_and_ball=True),
                                 assets=common.ASSETS)
  task = Fetch(model)
  environment_kwargs = environment_kwargs or {}
  return control.Environment(
      model, task, time_limit=time_limit,
      control_timestep=_CONTROL_TIMESTEP, seed=random,
      **environment_kwargs)


def _upright_reward(model, data, torso, deviation_angle=0):
  deviation = np.cos(np.deg2rad(deviation_angle))
  return rewards.tolerance(
      data.xmat[torso, 2, 2],
      bounds=(deviation, float('inf')), sigmoid='linear',
      margin=1 + deviation, value_at_margin=0)


class _QuadrupedTask(base.Task):
  """Shared observations/init for the quadruped tasks
  (reference suite/quadruped.py:145-305)."""

  def __init__(self, model):
    super().__init__(model)
    self._torso = self.body_id('torso')
    self._root_q = self.joint_qposadr('root')
    from dm_control_tpu.models import constants
    self._hinge_q = [model.jnt_qposadr[j] for j in range(model.njnt)
                     if model.jnt_type[j] == constants.JointType.HINGE]
    self._hinge_v = [model.jnt_dofadr[j] for j in range(model.njnt)
                     if model.jnt_type[j] == constants.JointType.HINGE]
    self._vel_slice = self.sensor_slice('velocimeter')
    self._imu = [self.sensor_slice('imu_accel'),
                 self.sensor_slice('imu_gyro')]
    names = model.names.names('sensor')
    self._ft = [self.sensor_slice(n) for n in names
                if n.startswith(('force_', 'torque_'))]
    self._rf = [self.sensor_slice(n) for n in names
                if n.startswith('rf_')]
    self._workspace_s = self.site_id('workspace')

  def _find_non_contacting_height(self, model, data, quat, x=0.0,
                                  y=0.0):
    """Raise the root in 1cm steps until nothing penetrates
    (reference suite/quadruped.py:250-278)."""
    dtype = data.qpos.dtype
    adr = self._root_q
    qpos0 = jnp.asarray(data.qpos)
    qpos0 = qpos0.at[adr].set(jnp.asarray(x, dtype))
    qpos0 = qpos0.at[adr + 1].set(jnp.asarray(y, dtype))
    qpos0 = qpos0.at[adr + 3:adr + 7].set(quat)

    def ncon_at(z):
      q = qpos0.at[adr + 2].set(z)
      d = data.replace(qpos=q)
      d = smooth.kinematics(model, d)
      d = coll_ops.collision(model, d)
      return jnp.sum(d.contact.active.astype(jnp.int32))

    def cond(carry):
      z, n, it = carry
      return (n > 0) & (it < 1000)

    def body(carry):
      z, _, it = carry
      z = z + 0.01
      return z, ncon_at(z), it + 1

    z0 = jnp.zeros((), dtype=dtype)
    z, _, _ = jax.lax.while_loop(cond, body, (z0, ncon_at(z0), 0))
    return qpos0.at[adr + 2].set(z)

  def _random_orientation(self, rng, dtype):
    quat = jax.random.normal(rng, (4,), dtype=dtype)
    return quat / jnp.maximum(jnp.linalg.norm(quat), 1e-12)

  def _common_observations(self, data):
    obs = collections.OrderedDict()
    hq = jnp.stack([data.qpos[a] for a in self._hinge_q])
    hv = jnp.stack([data.qvel[a] for a in self._hinge_v])
    obs['egocentric_state'] = jnp.concatenate([hq, hv, data.act])
    obs['torso_velocity'] = data.sensordata[self._vel_slice]
    obs['torso_upright'] = data.xmat[self._torso, 2, 2]
    obs['imu'] = jnp.concatenate(
        [data.sensordata[s] for s in self._imu])
    obs['force_torque'] = jnp.arcsinh(jnp.concatenate(
        [data.sensordata[s] for s in self._ft]))
    return obs


class Move(_QuadrupedTask):
  """Move forward at the desired horizontal speed, staying upright."""

  def __init__(self, model, desired_speed):
    super().__init__(model)
    self._desired_speed = desired_speed

  def initialize_episode(self, model, data, rng):
    quat = self._random_orientation(rng, data.qpos.dtype)
    qpos = self._find_non_contacting_height(model, data, quat)
    return data.replace(qpos=qpos)

  def get_observation(self, model, data):
    return self._common_observations(data)

  def get_reward(self, model, data):
    move_reward = rewards.tolerance(
        data.sensordata[self._vel_slice][0],
        bounds=(self._desired_speed, float('inf')),
        margin=self._desired_speed, value_at_margin=0.5,
        sigmoid='linear')
    return _upright_reward(model, data, self._torso) * move_reward


class Escape(_QuadrupedTask):
  """Escape a bowl-shaped terrain (reference quadruped.py:368-440).

  The bowl heightfield (sinusoidal bowl x random smooth bumps) is
  regenerated per episode into model.hfield_data. Rangefinder rays do
  not yet intersect the heightfield surface (they see other geoms
  only), so in-bowl rangefinder readings are mostly 1.0 (no hit).
  """

  def randomize_model(self, model, rng):
    res = model.hfield_nrow[0]
    dtype = model.hfield_data.dtype
    grid = jnp.linspace(-1.0, 1.0, res, dtype=dtype)
    radius = jnp.clip(jnp.sqrt(grid[None, :] ** 2 + grid[:, None] ** 2),
                      .04, 1)
    bowl_shape = .5 - jnp.cos(2 * np.pi * radius) / 2
    terrain_size = 2 * model.hfield_size[0, 0]
    bump_res = int(float(terrain_size) / _TERRAIN_BUMP_SCALE)
    bumps = jax.random.uniform(rng, (bump_res, bump_res), dtype,
                               _TERRAIN_SMOOTHNESS, 1.0)
    smooth_bumps = jax.image.resize(bumps, (res, res), 'bicubic')
    terrain = (bowl_shape * smooth_bumps).reshape(-1)
    return model.replace(hfield_data=terrain)

  def initialize_episode(self, model, data, rng):
    quat = self._random_orientation(rng, data.qpos.dtype)
    qpos = self._find_non_contacting_height(model, data, quat)
    return data.replace(qpos=qpos)

  def get_observation(self, model, data):
    obs = self._common_observations(data)
    # origin in torso frame
    torso_frame = data.xmat[self._torso]
    torso_pos = data.xpos[self._torso]
    obs['origin'] = -torso_pos @ torso_frame
    rf = jnp.concatenate([data.sensordata[s] for s in self._rf])
    obs['rangefinder'] = jnp.where(rf == -1.0, 1.0, jnp.tanh(rf))
    return obs

  def get_reward(self, model, data):
    terrain_size = model.hfield_size[0, 0]
    escape_reward = rewards.tolerance(
        jnp.linalg.norm(data.site_xpos[self._workspace_s]),
        bounds=(terrain_size, float('inf')),
        margin=terrain_size, value_at_margin=0, sigmoid='linear')
    return _upright_reward(model, data, self._torso,
                           deviation_angle=20) * escape_reward


class Fetch(_QuadrupedTask):
  """Bring the ball to the target (reference quadruped.py:443-477)."""

  def __init__(self, model):
    super().__init__(model)
    self._ball_b = self.body_id('ball')
    self._ball_g = self.geom_id('ball')
    self._floor_g = self.geom_id('floor')
    self._target_s = self.site_id('target')
    self._ball_q = self.joint_qposadr('ball_root')
    self._ball_v = self.joint_dofadr('ball_root')
    self._root_v = self.joint_dofadr('root')

  def initialize_episode(self, model, data, rng):
    dtype = data.qpos.dtype
    ka, kxy, kb, kv = jax.random.split(rng, 4)
    azimuth = jax.random.uniform(ka, (), dtype, 0, 2 * np.pi)
    quat = jnp.stack([jnp.cos(azimuth / 2), jnp.zeros((), dtype),
                      jnp.zeros((), dtype), jnp.sin(azimuth / 2)])
    spawn_radius = 0.9 * model.geom_size[self._floor_g, 0]
    xy = jax.random.uniform(kxy, (2,), dtype, -spawn_radius,
                            spawn_radius)
    qpos = self._find_non_contacting_height(model, data, quat,
                                            x=xy[0], y=xy[1])
    bxy = jax.random.uniform(kb, (2,), dtype, -spawn_radius,
                             spawn_radius)
    qpos = qpos.at[self._ball_q:self._ball_q + 2].set(bxy)
    qpos = qpos.at[self._ball_q + 2].set(jnp.asarray(2.0, dtype))
    qvel = jnp.asarray(data.qvel)
    qvel = qvel.at[self._ball_v:self._ball_v + 2].set(
        5 * jax.random.normal(kv, (2,), dtype))
    return data.replace(qpos=qpos, qvel=qvel)

  def get_observation(self, model, data):
    obs = self._common_observations(data)
    torso_frame = data.xmat[self._torso]
    torso_pos = data.xpos[self._torso]
    ball_rel_pos = data.xpos[self._ball_b] - torso_pos
    ball_rel_vel = (data.qvel[self._ball_v:self._ball_v + 3] -
                    data.qvel[self._root_v:self._root_v + 3])
    ball_rot_vel = data.qvel[self._ball_v + 3:self._ball_v + 6]
    ball_state = jnp.stack([ball_rel_pos, ball_rel_vel, ball_rot_vel])
    obs['ball_state'] = (ball_state @ torso_frame).ravel()
    torso_to_target = data.site_xpos[self._target_s] - torso_pos
    obs['target_position'] = torso_to_target @ torso_frame
    return obs

  def get_reward(self, model, data):
    arena_radius = model.geom_size[self._floor_g, 0] * np.sqrt(2)
    workspace_radius = model.site_size[self._workspace_s, 0]
    ball_radius = model.geom_size[self._ball_g, 0]
    self_to_ball = (data.site_xpos[self._workspace_s] -
                    data.xpos[self._ball_b])
    reach_reward = rewards.tolerance(
        jnp.linalg.norm(self_to_ball[:2]),
        bounds=(0, workspace_radius + ball_radius),
        sigmoid='linear', margin=arena_radius, value_at_margin=0)
    target_radius = model.site_size[self._target_s, 0]
    ball_to_target = (data.site_xpos[self._target_s] -
                      data.xpos[self._ball_b])
    fetch_reward = rewards.tolerance(
        jnp.linalg.norm(ball_to_target[:2]),
        bounds=(0, target_radius), sigmoid='linear',
        margin=arena_radius, value_at_margin=0)
    reach_then_fetch = reach_reward * (0.5 + 0.5 * fetch_reward)
    return _upright_reward(model, data, self._torso) * reach_then_fetch
