"""Quadruped domain (behavioural parity: reference suite/quadruped.py).

Round 1 ships the flat-floor tasks (walk, run); escape (heightfield
terrain + rangefinders) and fetch (walls + ball) follow with hfield
collision and ray sensors.
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
from dm_control_tpu.utils import containers
from dm_control_tpu.utils import rewards

_DEFAULT_TIME_LIMIT = 20
_CONTROL_TIMESTEP = .02
_RUN_SPEED = 5
_WALK_SPEED = 0.5
SUITE = containers.TaggedTasks()

_LEGS = {  # name -> (hip position, hip yaw in degrees)
    'front_left': ((.2, .2, 0), 45),
    'front_right': ((.2, -.2, 0), -45),
    'back_right': ((-.2, -.2, 0), -135),
    'back_left': ((-.2, .2, 0), 135),
}


def _leg_xml(name: str) -> str:
  (px, py, pz), yaw = _LEGS[name]
  return f"""
      <body name="hip_{name}" pos="{px} {py} {pz}" euler="0 0 {yaw}"
            childclass="hip">
        <joint name="yaw_{name}" class="yaw"/>
        <joint name="pitch_{name}" class="pitch"/>
        <geom name="thigh_{name}"/>
        <body name="knee_{name}" pos=".3 0 .11" childclass="knee">
          <joint name="knee_{name}"/>
          <geom name="shin_{name}"/>
          <body name="ankle_{name}" pos=".25 0 -.25" childclass="ankle">
            <joint name="ankle_{name}"/>
            <geom name="foot_{name}"/>
            <body name="toe_{name}" pos="0 0 -.3" childclass="toe">
              <geom name="toe_{name}"/>
              <site name="toe_{name}"/>
            </body>
          </body>
        </body>
      </body>"""


def _leg_tendons(name: str) -> str:
  return f"""
    <fixed name="coupling_{name}">
      <joint joint="pitch_{name}" coef=".333"/>
      <joint joint="knee_{name}" coef=".333"/>
      <joint joint="ankle_{name}" coef=".333"/>
    </fixed>
    <fixed name="extend_{name}">
      <joint joint="pitch_{name}" coef=".25"/>
      <joint joint="knee_{name}" coef="-.5"/>
      <joint joint="ankle_{name}" coef=".25"/>
    </fixed>
    <fixed name="lift_{name}">
      <joint joint="pitch_{name}" coef=".5"/>
      <joint joint="ankle_{name}" coef="-.5"/>
    </fixed>"""


def make_model(floor_size: float = 10.0) -> str:
  """Flat-floor quadruped with coupled 3-dof legs."""
  legs = ''.join(_leg_xml(n) for n in _LEGS)
  tendons = ''.join(_leg_tendons(n) for n in _LEGS)
  couplings = '\n'.join(
      f'    <tendon name="coupling_{n}" tendon1="coupling_{n}"'
      f' class="coupling"/>' for n in _LEGS)
  actuators = '\n'.join(
      f'    <general name="yaw_{n}" class="yaw_act" joint="yaw_{n}"/>\n'
      f'    <general name="lift_{n}" class="lift_act"'
      f' tendon="lift_{n}"/>\n'
      f'    <general name="extend_{n}" class="extend_act"'
      f' tendon="extend_{n}"/>' for n in _LEGS)
  force_sensors = '\n'.join(
      f'    <force name="force_toe_{n}" site="toe_{n}"/>' for n in _LEGS)
  torque_sensors = '\n'.join(
      f'    <torque name="torque_toe_{n}" site="toe_{n}"/>'
      for n in _LEGS)
  return f"""
<mujoco model="quadruped">
  <option timestep=".005"/>
  <default>
    <geom solimp=".9 .99 .003" solref=".01 1"/>
    <default class="body">
      <geom type="capsule" size=".08" condim="1" density="500"/>
      <joint type="hinge" damping="30" armature=".01" limited="true"
             solimplimit="0 .99 .01"/>
      <default class="hip">
        <default class="yaw">
          <joint axis="0 0 1" range="-50 50"/>
        </default>
        <default class="pitch">
          <joint axis="0 1 0" range="-20 60"/>
        </default>
        <geom fromto="0 0 0 .3 0 .11"/>
      </default>
      <default class="knee">
        <joint axis="0 1 0" range="-60 50"/>
        <geom size=".065" fromto="0 0 0 .25 0 -.25"/>
      </default>
      <default class="ankle">
        <joint axis="0 1 0" range="-45 55"/>
        <geom size=".055" fromto="0 0 0 0 0 -.25"/>
      </default>
      <default class="toe">
        <geom type="sphere" size=".08" friction="1.5"/>
        <site type="sphere" size=".084" group="4"/>
      </default>
    </default>
    <default class="coupling">
      <equality solimp="0.95 0.99 0.01" solref=".005 .5"/>
    </default>
    <general ctrllimited="true" gainprm="1000" biasprm="0 -1000"
             biastype="affine" dyntype="filter" dynprm=".1"/>
    <default class="yaw_act">
      <general ctrlrange="-1 1"/>
    </default>
    <default class="lift_act">
      <general ctrlrange="-1 1.1"/>
    </default>
    <default class="extend_act">
      <general ctrlrange="-.8 .8"/>
    </default>
  </default>
  <worldbody>
    <geom name="floor" type="plane" size="{floor_size} {floor_size} .5"/>
    <body name="torso" childclass="body" pos="0 0 .57">
      <freejoint name="root"/>
      <geom name="eye_r" type="cylinder" size=".05"
            fromto=".1 -.07 .12 .31 -.07 .08" mass="0"/>
      <geom name="eye_l" type="cylinder" size=".05"
            fromto=".1 .07 .12 .31 .07 .08" mass="0"/>
      <geom name="torso" type="ellipsoid" size=".3 .27 .2"
            density="1000"/>
      <site name="torso_touch" type="box" size=".26 .26 .26"/>
      <site name="torso" size=".05"/>
      <site name="workspace" type="sphere" size=".3 .3 .3"
            pos=".8 0 -.2" group="3"/>{legs}
    </body>
  </worldbody>
  <tendon>{tendons}
  </tendon>
  <equality>
{couplings}
  </equality>
  <actuator>
{actuators}
  </actuator>
  <sensor>
    <accelerometer name="imu_accel" site="torso"/>
    <gyro name="imu_gyro" site="torso"/>
    <velocimeter name="velocimeter" site="torso"/>
{force_sensors}
{torque_sensors}
    <subtreecom name="center_of_mass" body="torso"/>
  </sensor>
</mujoco>
"""


def _make_env(desired_speed, floor_size, time_limit, random,
              environment_kwargs):
  model = models.from_xml_string(make_model(floor_size=floor_size))
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


def _upright_reward(model, data, torso, deviation_angle=0):
  deviation = np.cos(np.deg2rad(deviation_angle))
  return rewards.tolerance(
      data.xmat[torso, 2, 2],
      bounds=(deviation, float('inf')), sigmoid='linear',
      margin=1 + deviation, value_at_margin=0)


class Move(base.Task):
  """Move forward at the desired horizontal speed, staying upright."""

  def __init__(self, model, desired_speed):
    super().__init__(model)
    self._desired_speed = desired_speed
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

  def initialize_episode(self, model, data, rng):
    """Random orientation; raise the root until there are no contacts."""
    quat = jax.random.normal(rng, (4,), dtype=data.qpos.dtype)
    quat = quat / jnp.maximum(jnp.linalg.norm(quat), 1e-12)
    adr = self._root_q
    qpos0 = jnp.asarray(data.qpos)
    qpos0 = qpos0.at[adr:adr + 3].set(
        jnp.zeros(3, dtype=data.qpos.dtype))
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

    z0 = jnp.zeros((), dtype=data.qpos.dtype)
    z, _, _ = jax.lax.while_loop(cond, body, (z0, ncon_at(z0), 0))
    return data.replace(qpos=qpos0.at[adr + 2].set(z))

  def get_observation(self, model, data):
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

  def get_reward(self, model, data):
    move_reward = rewards.tolerance(
        data.sensordata[self._vel_slice][0],
        bounds=(self._desired_speed, float('inf')),
        margin=self._desired_speed, value_at_margin=0.5,
        sigmoid='linear')
    return _upright_reward(model, data, self._torso) * move_reward
