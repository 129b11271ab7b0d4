"""Cheetah domain (behavioural parity: reference suite/cheetah.py)."""

import collections

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu import models
from dm_control_tpu.ops import forward as forward_ops
from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.utils import containers
from dm_control_tpu.utils import rewards

_DEFAULT_TIME_LIMIT = 10
_RUN_SPEED = 10
SUITE = containers.TaggedTasks()


def make_model() -> str:
  """Planar running quadruped (total mass rescaled to 14 kg)."""
  return """
<mujoco model="cheetah">
  <compiler settotalmass="14"/>
  <option timestep="0.01"/>
  <default>
    <default class="cheetah">
      <joint limited="true" damping=".01" armature=".1" stiffness="8"
             type="hinge" axis="0 1 0"/>
      <geom contype="1" conaffinity="1" condim="3" friction=".4 .1 .1"/>
    </default>
    <default class="free">
      <joint limited="false" damping="0" armature="0" stiffness="0"/>
    </default>
    <motor ctrllimited="true" ctrlrange="-1 1"/>
  </default>
  <worldbody>
    <geom name="ground" type="plane" conaffinity="1" pos="98 0 0"
          size="100 .8 .5"/>
    <body name="torso" pos="0 0 .7" childclass="cheetah">
      <joint name="rootx" type="slide" axis="1 0 0" class="free"/>
      <joint name="rootz" type="slide" axis="0 0 1" class="free"/>
      <joint name="rooty" type="hinge" axis="0 1 0" class="free"/>
      <geom name="torso" type="capsule" fromto="-.5 0 0 .5 0 0"
            size="0.046"/>
      <geom name="head" type="capsule" pos=".6 0 .1" euler="0 50 0"
            size="0.046 .15"/>
      <body name="bthigh" pos="-.5 0 0">
        <joint name="bthigh" range="-30 60" stiffness="240" damping="6"/>
        <geom name="bthigh" type="capsule" pos=".1 0 -.13"
              euler="0 -218 0" size="0.046 .145"/>
        <body name="bshin" pos=".16 0 -.25">
          <joint name="bshin" range="-50 50" stiffness="180"
                 damping="4.5"/>
          <geom name="bshin" type="capsule" pos="-.14 0 -.07"
                euler="0 -116 0" size="0.046 .15"/>
          <body name="bfoot" pos="-.28 0 -.14">
            <joint name="bfoot" range="-230 50" stiffness="120"
                   damping="3"/>
            <geom name="bfoot" type="capsule" pos=".03 0 -.097"
                  euler="0 -15 0" size="0.046 .094"/>
          </body>
        </body>
      </body>
      <body name="fthigh" pos=".5 0 0">
        <joint name="fthigh" range="-57 .40" stiffness="180"
               damping="4.5"/>
        <geom name="fthigh" type="capsule" pos="-.07 0 -.12"
              euler="0 30 0" size="0.046 .133"/>
        <body name="fshin" pos="-.14 0 -.24">
          <joint name="fshin" range="-70 50" stiffness="120" damping="3"/>
          <geom name="fshin" type="capsule" pos=".065 0 -.09"
                euler="0 -34 0" size="0.046 .106"/>
          <body name="ffoot" pos=".13 0 -.18">
            <joint name="ffoot" range="-28 28" stiffness="60"
                   damping="1.5"/>
            <geom name="ffoot" type="capsule" pos=".045 0 -.07"
                  euler="0 -34 0" size="0.046 .07"/>
          </body>
        </body>
      </body>
    </body>
  </worldbody>
  <sensor>
    <subtreelinvel name="torso_subtreelinvel" body="torso"/>
  </sensor>
  <actuator>
    <motor name="bthigh" joint="bthigh" gear="120"/>
    <motor name="bshin" joint="bshin" gear="90"/>
    <motor name="bfoot" joint="bfoot" gear="60"/>
    <motor name="fthigh" joint="fthigh" gear="90"/>
    <motor name="fshin" joint="fshin" gear="60"/>
    <motor name="ffoot" joint="ffoot" gear="30"/>
  </actuator>
</mujoco>
"""


@SUITE.add('benchmarking')
def run(time_limit=_DEFAULT_TIME_LIMIT, random=None,
        environment_kwargs=None):
  """Returns the run task."""
  model = models.from_xml_string(make_model())
  task = Cheetah(model)
  environment_kwargs = environment_kwargs or {}
  return control.Environment(model, task, time_limit=time_limit,
                             seed=random, **environment_kwargs)


class Cheetah(base.Task):
  """Run forward fast."""

  def __init__(self, model):
    super().__init__(model)
    self._speed_slice = self.sensor_slice('torso_subtreelinvel')

  def initialize_episode(self, model, data, rng):
    qpos = base.random_limited_qpos_only_limited(model, rng)
    data = data.replace(qpos=qpos)
    # settle for 200 steps before starting the episode (reference
    # cheetah.py:69-74), then restart the clock
    def body(d, _):
      return forward_ops.step(model, d), ()
    data, _ = jax.lax.scan(body, data, None, length=200)
    return data.replace(time=jnp.zeros((), data.qpos.dtype))

  def get_observation(self, model, data):
    obs = collections.OrderedDict()
    obs['position'] = data.qpos[1:]
    obs['velocity'] = data.qvel
    return obs

  def get_reward(self, model, data):
    return rewards.tolerance(
        data.sensordata[self._speed_slice][0],
        bounds=(_RUN_SPEED, float('inf')), margin=_RUN_SPEED,
        value_at_margin=0, sigmoid='linear')
