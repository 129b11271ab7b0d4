"""Pendulum domain (behavioural parity: reference suite/pendulum.py)."""

import collections

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu import models
from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.utils import containers
from dm_control_tpu.utils import rewards

_DEFAULT_TIME_LIMIT = 20
_ANGLE_BOUND = 8
_COSINE_BOUND = np.cos(np.deg2rad(_ANGLE_BOUND))
SUITE = containers.TaggedTasks()


def make_model() -> str:
  """Inverted pendulum: single torque-limited hinge, swing-up regime."""
  return """
<mujoco model="pendulum">
  <option timestep="0.02">
    <flag contact="disable" energy="enable"/>
  </option>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 .2" rgba=".3 .4 .5 1"/>
    <camera name="fixed" pos="0 -1.5 2" xyaxes="1 0 0 0 1 1"/>
    <body name="pole" pos="0 0 0.6">
      <joint name="hinge" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom name="base" type="cylinder" fromto="0 -.03 0 0 .03 0"
            size="0.021" mass="0" rgba=".3 .5 .7 1"/>
      <geom name="pole" type="capsule" fromto="0 0 0 0 0 0.5"
            size="0.02" mass="0" rgba=".7 .5 .3 1"/>
      <geom name="mass" type="sphere" pos="0 0 0.5" size="0.05"
            mass="1" rgba=".7 .4 .2 1"/>
    </body>
  </worldbody>
  <actuator>
    <motor name="torque" joint="hinge" gear="1" ctrllimited="true"
           ctrlrange="-1 1"/>
  </actuator>
</mujoco>
"""


@SUITE.add('benchmarking')
def swingup(time_limit=_DEFAULT_TIME_LIMIT, random=None,
            environment_kwargs=None):
  """Returns pendulum swingup task."""
  model = models.from_xml_string(make_model())
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
