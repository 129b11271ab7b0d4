"""Swimmer domain (behavioural parity: reference suite/swimmer.py).

Procedurally generates an n-link swimmer; locomotion forces come from
the medium-density fluid drag model (option density=3000).
"""

import collections

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu import models
from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.utils import containers
from dm_control_tpu.utils import rewards

_DEFAULT_TIME_LIMIT = 30
_CONTROL_TIMESTEP = .03
SUITE = containers.TaggedTasks()


def make_model(n_bodies: int) -> str:
  """Generates an n-body swimmer model."""
  if n_bodies < 3:
    raise ValueError(f'at least 3 bodies required, got {n_bodies}')
  joint_limit = 360.0 / n_bodies

  segments = ''
  indent = '      '
  for i in range(n_bodies - 1):
    segments += f"""
{indent}<body name="segment_{i}" pos="0 .1 0">
{indent}  <geom class="visual" name="visual_{i}"/>
{indent}  <geom class="inertial" name="inertial_{i}"/>
{indent}  <site name="site_{i}"/>
{indent}  <joint name="joint_{i}" range="-{joint_limit} {joint_limit}"/>"""
    indent += '  '
  for i in range(n_bodies - 1):
    indent = indent[:-2]
    segments += f'\n{indent}</body>'

  actuators = '\n'.join(
      f'    <motor name="motor_{i}" joint="joint_{i}"/>'
      for i in range(n_bodies - 1))
  sensors = '\n'.join(
      f'    <velocimeter name="velocimeter_{i}" site="site_{i}"/>\n'
      f'    <gyro name="gyro_{i}" site="site_{i}"/>'
      for i in range(n_bodies - 1))

  return f"""
<mujoco model="swimmer">
  <option timestep="0.002" density="3000">
    <flag contact="disable"/>
  </option>
  <default>
    <default class="swimmer">
      <joint type="hinge" pos="0 -.05 0" axis="0 0 1" limited="true"
             solreflimit=".05 1" solimplimit="0 .8 .1" armature="1e-6"/>
      <default class="inertial">
        <geom type="box" size=".001 .05 .01" mass=".01"/>
      </default>
      <default class="visual">
        <geom type="capsule" size=".01" fromto="0 -.05 0 0 .05 0"
              mass="0"/>
      </default>
      <site size=".01"/>
    </default>
    <default class="free">
      <joint limited="false" stiffness="0" armature="0"/>
    </default>
    <motor gear="5e-4" ctrllimited="true" ctrlrange="-1 1"/>
  </default>
  <worldbody>
    <geom name="ground" type="plane" size="2 2 0.1"/>
    <body name="head" pos="0 0 .05" childclass="swimmer">
      <geom name="head" type="ellipsoid" size=".02 .04 .017"
            pos="0 -.022 0" mass="0"/>
      <geom name="nose" type="sphere" pos="0 -.06 0" size=".004"
            mass="0"/>
      <joint name="rootx" class="free" type="slide" axis="1 0 0"
             pos="0 -.05 0"/>
      <joint name="rooty" class="free" type="slide" axis="0 1 0"
             pos="0 -.05 0"/>
      <joint name="rootz" class="free" type="hinge" axis="0 0 1"
             pos="0 -.05 0"/>
      <geom name="inertial" class="inertial"/>
      <geom name="visual" class="visual"/>
      <site name="head"/>{segments}
    </body>
    <geom name="target" type="sphere" pos="1 1 .05" size=".1"/>
  </worldbody>
  <sensor>
    <framepos name="nose_pos" objtype="geom" objname="nose"/>
    <framepos name="target_pos" objtype="geom" objname="target"/>
    <framexaxis name="head_xaxis" objtype="xbody" objname="head"/>
    <frameyaxis name="head_yaxis" objtype="xbody" objname="head"/>
    <velocimeter name="head_vel" site="head"/>
    <gyro name="head_gyro" site="head"/>
{sensors}
  </sensor>
  <actuator>
{actuators}
  </actuator>
</mujoco>
"""


@SUITE.add('benchmarking')
def swimmer6(time_limit=_DEFAULT_TIME_LIMIT, random=None,
             environment_kwargs=None):
  """Returns a 6-link swimmer."""
  return _make_swimmer(6, time_limit, random, environment_kwargs)


@SUITE.add('benchmarking')
def swimmer15(time_limit=_DEFAULT_TIME_LIMIT, random=None,
              environment_kwargs=None):
  """Returns a 15-link swimmer."""
  return _make_swimmer(15, time_limit, random, environment_kwargs)


def swimmer(n_links=3, time_limit=_DEFAULT_TIME_LIMIT, random=None,
            environment_kwargs=None):
  """Returns a swimmer with n links."""
  return _make_swimmer(n_links, time_limit, random, environment_kwargs)


def _make_swimmer(n_joints, time_limit, random, environment_kwargs):
  model = models.from_xml_string(make_model(n_joints))
  task = Swimmer(model)
  environment_kwargs = environment_kwargs or {}
  return control.Environment(
      model, task, time_limit=time_limit,
      control_timestep=_CONTROL_TIMESTEP, seed=random,
      **environment_kwargs)


class Swimmer(base.Task):
  """Swim to the target."""

  def __init__(self, model):
    super().__init__(model)
    self._head = self.body_id('head')
    self._nose = self.geom_id('nose')
    self._target = self.geom_id('target')
    self._target_size = float(np.asarray(model.geom_size)[
        self._target, 0])
    self._nseg = sum(1 for n in model.names.names('sensor')
                     if n.startswith('velocimeter_'))

  def randomize_model(self, model, rng):
    k1, k2 = jax.random.split(rng)
    close = jax.random.uniform(k1) < 0.2
    box = jnp.where(close, 0.3, 2.0)
    xy = jax.random.uniform(k2, (2,), minval=-1.0, maxval=1.0) * box
    geom_pos = jnp.asarray(model.geom_pos)
    geom_pos = geom_pos.at[self._target, 0:2].set(xy)
    return model.replace(geom_pos=geom_pos)

  def initialize_episode(self, model, data, rng):
    qpos = base.random_limited_qpos(model, rng)
    return data.replace(qpos=qpos)

  def _nose_to_target(self, data):
    dif = (data.geom_xpos[self._target] - data.geom_xpos[self._nose])
    head = data.xmat[self._head]
    return (dif @ head)[:2]

  def get_observation(self, model, data):
    obs = collections.OrderedDict()
    obs['joints'] = data.qpos[3:]
    obs['to_target'] = self._nose_to_target(data)
    # per-segment local velocities vx, vy, wz (velocimeter + gyro)
    xvel = data.sensordata[12:].reshape(-1, 6)
    obs['body_velocities'] = xvel[:, jnp.array([0, 1, 5])].ravel()
    return obs

  def get_reward(self, model, data):
    dist = jnp.linalg.norm(self._nose_to_target(data))
    return rewards.tolerance(dist, bounds=(0, self._target_size),
                             margin=5 * self._target_size,
                             sigmoid='long_tail')
