"""Humanoid domain (behavioural parity: reference suite/humanoid.py)."""

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

_DEFAULT_TIME_LIMIT = 25
_CONTROL_TIMESTEP = .025
_STAND_HEIGHT = 1.4
_WALK_SPEED = 1
_RUN_SPEED = 10
SUITE = containers.TaggedTasks()


def make_model() -> str:
  """21-actuator humanoid with frictionless (condim 1) capsule contacts."""
  return """
<mujoco model="humanoid">
  <option timestep=".005"/>
  <default>
    <motor ctrlrange="-1 1" ctrllimited="true"/>
    <default class="body">
      <geom type="capsule" condim="1" friction=".7" solimp=".9 .99 .003"
            solref=".015 1"/>
      <joint type="hinge" damping=".2" stiffness="1" armature=".01"
             limited="true" solimplimit="0 .99 .01"/>
      <site size=".04" group="3"/>
      <default class="big_joint">
        <joint damping="5" stiffness="10"/>
        <default class="big_stiff_joint">
          <joint stiffness="20"/>
        </default>
      </default>
      <default class="force-torque">
        <site type="box" size=".01 .01 .02"/>
      </default>
      <default class="touch">
        <site type="capsule"/>
      </default>
    </default>
  </default>
  <worldbody>
    <geom name="floor" type="plane" conaffinity="1" size="100 100 .2"/>
    <body name="torso" pos="0 0 1.5" childclass="body">
      <freejoint name="root"/>
      <site name="root" class="force-torque"/>
      <geom name="torso" fromto="0 -.07 0 0 .07 0" size=".07"/>
      <geom name="upper_waist" fromto="-.01 -.06 -.12 -.01 .06 -.12"
            size=".06"/>
      <site name="torso" class="touch" type="box" pos="0 0 -.05"
            size=".075 .14 .13"/>
      <body name="head" pos="0 0 .19">
        <geom name="head" type="sphere" size=".09"/>
        <site name="head" class="touch" type="sphere" size=".091"/>
        <camera name="egocentric" pos=".09 0 0" xyaxes="0 -1 0 .1 0 1"
                fovy="80"/>
      </body>
      <body name="lower_waist" pos="-.01 0 -.260" quat="1.000 0 -.002 0">
        <geom name="lower_waist" fromto="0 -.06 0 0 .06 0" size=".06"/>
        <site name="lower_waist" class="touch" size=".061 .06"
              zaxis="0 1 0"/>
        <joint name="abdomen_z" pos="0 0 .065" axis="0 0 1"
               range="-45 45" class="big_stiff_joint"/>
        <joint name="abdomen_y" pos="0 0 .065" axis="0 1 0"
               range="-75 30" class="big_joint"/>
        <body name="pelvis" pos="0 0 -.165" quat="1.000 0 -.002 0">
          <joint name="abdomen_x" pos="0 0 .1" axis="1 0 0"
                 range="-35 35" class="big_joint"/>
          <geom name="butt" fromto="-.02 -.07 0 -.02 .07 0" size=".09"/>
          <site name="butt" class="touch" size=".091 .07" pos="-.02 0 0"
                zaxis="0 1 0"/>
          <body name="right_thigh" pos="0 -.1 -.04">
            <site name="right_hip" class="force-torque"/>
            <joint name="right_hip_x" axis="1 0 0" range="-25 5"
                   class="big_joint"/>
            <joint name="right_hip_z" axis="0 0 1" range="-60 35"
                   class="big_joint"/>
            <joint name="right_hip_y" axis="0 1 0" range="-110 20"
                   class="big_stiff_joint"/>
            <geom name="right_thigh" fromto="0 0 0 0 .01 -.34"
                  size=".06"/>
            <site name="right_thigh" class="touch" pos="0 .005 -.17"
                  size=".061 .17" zaxis="0 -1 34"/>
            <body name="right_shin" pos="0 .01 -.403">
              <site name="right_knee" class="force-torque"
                    pos="0 0 .02"/>
              <joint name="right_knee" pos="0 0 .02" axis="0 -1 0"
                     range="-160 2"/>
              <geom name="right_shin" fromto="0 0 0 0 0 -.3"
                    size=".049"/>
              <site name="right_shin" class="touch" pos="0 0 -.15"
                    size=".05 .15"/>
              <body name="right_foot" pos="0 0 -.39">
                <site name="right_ankle" class="force-torque"/>
                <joint name="right_ankle_y" pos="0 0 .08" axis="0 1 0"
                       range="-50 50" stiffness="6"/>
                <joint name="right_ankle_x" pos="0 0 .04" axis="1 0 .5"
                       range="-50 50" stiffness="3"/>
                <geom name="right_right_foot" fromto="-.07 -.02 0 .14 -.04 0"
                      size=".027"/>
                <geom name="left_right_foot" fromto="-.07 0 0 .14 .02 0"
                      size=".027"/>
                <site name="right_right_foot" class="touch"
                      pos=".035 -.03 0" size=".03 .11" zaxis="21 -2 0"/>
                <site name="left_right_foot" class="touch"
                      pos=".035 .01 0" size=".03 .11" zaxis="21 2 0"/>
              </body>
            </body>
          </body>
          <body name="left_thigh" pos="0 .1 -.04">
            <site name="left_hip" class="force-torque"/>
            <joint name="left_hip_x" axis="-1 0 0" range="-25 5"
                   class="big_joint"/>
            <joint name="left_hip_z" axis="0 0 -1" range="-60 35"
                   class="big_joint"/>
            <joint name="left_hip_y" axis="0 1 0" range="-120 20"
                   class="big_stiff_joint"/>
            <geom name="left_thigh" fromto="0 0 0 0 -.01 -.34"
                  size=".06"/>
            <site name="left_thigh" class="touch" pos="0 -.005 -.17"
                  size=".061 .17" zaxis="0 1 34"/>
            <body name="left_shin" pos="0 -.01 -.403">
              <site name="left_knee" class="force-torque" pos="0 0 .02"/>
              <joint name="left_knee" pos="0 0 .02" axis="0 -1 0"
                     range="-160 2"/>
              <geom name="left_shin" fromto="0 0 0 0 0 -.3" size=".049"/>
              <site name="left_shin" class="touch" pos="0 0 -.15"
                    size=".05 .15"/>
              <body name="left_foot" pos="0 0 -.39">
                <site name="left_ankle" class="force-torque"/>
                <joint name="left_ankle_y" pos="0 0 .08" axis="0 1 0"
                       range="-50 50" stiffness="6"/>
                <joint name="left_ankle_x" pos="0 0 .04" axis="1 0 .5"
                       range="-50 50" stiffness="3"/>
                <geom name="left_left_foot" fromto="-.07 .02 0 .14 .04 0"
                      size=".027"/>
                <geom name="right_left_foot" fromto="-.07 0 0 .14 -.02 0"
                      size=".027"/>
                <site name="right_left_foot" class="touch"
                      pos=".035 -.01 0" size=".03 .11" zaxis="21 -2 0"/>
                <site name="left_left_foot" class="touch"
                      pos=".035 .03 0" size=".03 .11" zaxis="21 2 0"/>
              </body>
            </body>
          </body>
        </body>
      </body>
      <body name="right_upper_arm" pos="0 -.17 .06">
        <joint name="right_shoulder1" axis="2 1 1" range="-85 60"/>
        <joint name="right_shoulder2" axis="0 -1 1" range="-85 60"/>
        <geom name="right_upper_arm" fromto="0 0 0 .16 -.16 -.16"
              size=".04 .16"/>
        <site name="right_upper_arm" class="touch" pos=".08 -.08 -.08"
              size=".041 .14" zaxis="1 -1 -1"/>
        <body name="right_lower_arm" pos=".18 -.18 -.18">
          <joint name="right_elbow" axis="0 -1 1" range="-90 50"
                 stiffness="0"/>
          <geom name="right_lower_arm" fromto=".01 .01 .01 .17 .17 .17"
                size=".031"/>
          <site name="right_lower_arm" class="touch" pos=".09 .09 .09"
                size=".032 .14" zaxis="1 1 1"/>
          <body name="right_hand" pos=".18 .18 .18">
            <geom name="right_hand" type="sphere" size=".04"/>
            <site name="right_hand" class="touch" type="sphere"
                  size=".041"/>
          </body>
        </body>
      </body>
      <body name="left_upper_arm" pos="0 .17 .06">
        <joint name="left_shoulder1" axis="2 -1 1" range="-60 85"/>
        <joint name="left_shoulder2" axis="0 1 1" range="-60 85"/>
        <geom name="left_upper_arm" fromto="0 0 0 .16 .16 -.16"
              size=".04 .16"/>
        <site name="left_upper_arm" class="touch" pos=".08 .08 -.08"
              size=".041 .14" zaxis="1 1 -1"/>
        <body name="left_lower_arm" pos=".18 .18 -.18">
          <joint name="left_elbow" axis="0 -1 -1" range="-90 50"
                 stiffness="0"/>
          <geom name="left_lower_arm" fromto=".01 -.01 .01 .17 -.17 .17"
                size=".031"/>
          <site name="left_lower_arm" class="touch" pos=".09 -.09 .09"
                size=".032 .14" zaxis="1 -1 1"/>
          <body name="left_hand" pos=".18 -.18 .18">
            <geom name="left_hand" type="sphere" size=".04"/>
            <site name="left_hand" class="touch" type="sphere"
                  size=".041"/>
          </body>
        </body>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor name="abdomen_y" gear="40" joint="abdomen_y"/>
    <motor name="abdomen_z" gear="40" joint="abdomen_z"/>
    <motor name="abdomen_x" gear="40" joint="abdomen_x"/>
    <motor name="right_hip_x" gear="40" joint="right_hip_x"/>
    <motor name="right_hip_z" gear="40" joint="right_hip_z"/>
    <motor name="right_hip_y" gear="120" joint="right_hip_y"/>
    <motor name="right_knee" gear="80" joint="right_knee"/>
    <motor name="right_ankle_x" gear="20" joint="right_ankle_x"/>
    <motor name="right_ankle_y" gear="20" joint="right_ankle_y"/>
    <motor name="left_hip_x" gear="40" joint="left_hip_x"/>
    <motor name="left_hip_z" gear="40" joint="left_hip_z"/>
    <motor name="left_hip_y" gear="120" joint="left_hip_y"/>
    <motor name="left_knee" gear="80" joint="left_knee"/>
    <motor name="left_ankle_x" gear="20" joint="left_ankle_x"/>
    <motor name="left_ankle_y" gear="20" joint="left_ankle_y"/>
    <motor name="right_shoulder1" gear="20" joint="right_shoulder1"/>
    <motor name="right_shoulder2" gear="20" joint="right_shoulder2"/>
    <motor name="right_elbow" gear="40" joint="right_elbow"/>
    <motor name="left_shoulder1" gear="20" joint="left_shoulder1"/>
    <motor name="left_shoulder2" gear="20" joint="left_shoulder2"/>
    <motor name="left_elbow" gear="40" joint="left_elbow"/>
  </actuator>
  <sensor>
    <subtreelinvel name="torso_subtreelinvel" body="torso"/>
  </sensor>
</mujoco>
"""


def _make_env(move_speed, pure_state, time_limit, random,
              environment_kwargs):
  model = models.from_xml_string(make_model())
  task = Humanoid(model, move_speed=move_speed, pure_state=pure_state)
  environment_kwargs = environment_kwargs or {}
  return control.Environment(
      model, task, time_limit=time_limit,
      control_timestep=_CONTROL_TIMESTEP, seed=random,
      **environment_kwargs)


@SUITE.add('benchmarking')
def stand(time_limit=_DEFAULT_TIME_LIMIT, random=None,
          environment_kwargs=None):
  """Returns the Stand task."""
  return _make_env(0, False, time_limit, random, environment_kwargs)


@SUITE.add('benchmarking')
def walk(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
  """Returns the Walk task."""
  return _make_env(_WALK_SPEED, False, time_limit, random,
                   environment_kwargs)


@SUITE.add('benchmarking')
def run(time_limit=_DEFAULT_TIME_LIMIT, random=None,
        environment_kwargs=None):
  """Returns the Run task."""
  return _make_env(_RUN_SPEED, False, time_limit, random,
                   environment_kwargs)


@SUITE.add()
def run_pure_state(time_limit=_DEFAULT_TIME_LIMIT, random=None,
                   environment_kwargs=None):
  """Returns the Run task with pure-state observations."""
  return _make_env(_RUN_SPEED, True, time_limit, random,
                   environment_kwargs)


class Humanoid(base.Task):
  """Stand, walk or run, rewarded for uprightness and speed."""

  def __init__(self, model, move_speed, pure_state):
    super().__init__(model)
    self._move_speed = move_speed
    self._pure_state = pure_state
    self._torso = self.body_id('torso')
    self._head = self.body_id('head')
    self._extremities = [self.body_id(side + limb)
                         for side in ('left_', 'right_')
                         for limb in ('hand', 'foot')]
    self._com_vel_slice = self.sensor_slice('torso_subtreelinvel')

  def initialize_episode(self, model, data, rng):
    """Rejection-sample a collision-free random joint configuration
    (reference humanoid.py:167-175), as a traced while_loop."""

    def sample(key):
      qpos = base.random_limited_qpos(model, key)
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
    if self._pure_state:
      obs['position'] = data.qpos
      obs['velocity'] = data.qvel
      return obs
    obs['joint_angles'] = data.qpos[7:]
    obs['head_height'] = data.xpos[self._head, 2]
    torso_frame = data.xmat[self._torso]
    torso_pos = data.xpos[self._torso]
    ext = [ (data.xpos[b] - torso_pos) @ torso_frame
            for b in self._extremities]
    obs['extremities'] = jnp.concatenate(ext)
    obs['torso_vertical'] = data.xmat[self._torso, 2, :]
    obs['com_velocity'] = data.sensordata[self._com_vel_slice]
    obs['velocity'] = data.qvel
    return obs

  def get_reward(self, model, data):
    head_height = data.xpos[self._head, 2]
    standing = rewards.tolerance(
        head_height, bounds=(_STAND_HEIGHT, float('inf')),
        margin=_STAND_HEIGHT / 4)
    upright = rewards.tolerance(
        data.xmat[self._torso, 2, 2], bounds=(0.9, float('inf')),
        sigmoid='linear', margin=1.9, value_at_margin=0)
    stand_reward = standing * upright
    small_control = jnp.mean(rewards.tolerance(
        data.ctrl, margin=1, value_at_margin=0, sigmoid='quadratic'))
    small_control = (4 + small_control) / 5
    com_vel_xy = data.sensordata[self._com_vel_slice][:2]
    if self._move_speed == 0:
      dont_move = jnp.mean(rewards.tolerance(com_vel_xy, margin=2))
      return small_control * stand_reward * dont_move
    com_speed = jnp.linalg.norm(com_vel_xy)
    move = rewards.tolerance(
        com_speed, bounds=(self._move_speed, float('inf')),
        margin=self._move_speed, value_at_margin=0, sigmoid='linear')
    move = (5 * move + 1) / 6
    return small_control * stand_reward * move
