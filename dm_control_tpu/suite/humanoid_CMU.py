"""Humanoid_CMU domain (behavioural parity: reference
suite/humanoid_CMU.py:16-186).

The 56-dof CMU-skeleton humanoid, model loaded verbatim from
suite/assets/humanoid_CMU.xml.
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
from dm_control_tpu.utils import rewards

_DEFAULT_TIME_LIMIT = 20
_CONTROL_TIMESTEP = 0.02
_STAND_HEIGHT = 1.4     # head height above which stand reward is 1
_WALK_SPEED = 1
_RUN_SPEED = 10

SUITE = containers.TaggedTasks()


def make_model() -> str:
  """Reference model asset, verbatim (suite/assets/humanoid_CMU.xml)."""
  return common.read_model('humanoid_CMU.xml')


def _make_env(move_speed, time_limit, random, environment_kwargs):
  model = models.from_xml_string(make_model(), assets=common.ASSETS)
  task = HumanoidCMU(model, move_speed=move_speed)
  environment_kwargs = environment_kwargs or {}
  return control.Environment(
      model, task, time_limit=time_limit,
      control_timestep=_CONTROL_TIMESTEP, seed=random,
      **environment_kwargs)


@SUITE.add()
def stand(time_limit=_DEFAULT_TIME_LIMIT, random=None,
          environment_kwargs=None):
  """Returns the Stand task."""
  return _make_env(0, time_limit, random, environment_kwargs)


@SUITE.add()
def walk(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
  """Returns the Walk task."""
  return _make_env(_WALK_SPEED, time_limit, random, environment_kwargs)


@SUITE.add()
def run(time_limit=_DEFAULT_TIME_LIMIT, random=None,
        environment_kwargs=None):
  """Returns the Run task."""
  return _make_env(_RUN_SPEED, time_limit, random, environment_kwargs)


class HumanoidCMU(base.Task):
  """Stand, walk or run with the CMU-skeleton humanoid."""

  def __init__(self, model, move_speed):
    super().__init__(model)
    self._move_speed = move_speed
    self._thorax = self.body_id('thorax')
    self._head = self.body_id('head')
    self._extremities = [self.body_id(side + limb)
                         for side in ('l', 'r')
                         for limb in ('hand', 'foot')]
    self._com_vel_slice = self.sensor_slice('thorax_subtreelinvel')

  def initialize_episode(self, model, data, rng):
    """Rejection-sample a collision-free random joint configuration
    (reference humanoid_CMU.py:139-152), as a traced while_loop."""

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

  # ---------------- obs / reward ----------------
  def get_observation(self, model, data):
    obs = collections.OrderedDict()
    obs['joint_angles'] = data.qpos[7:]   # skip the free root
    obs['head_height'] = data.xpos[self._head, 2]
    torso_frame = data.xmat[self._thorax]
    torso_pos = data.xpos[self._thorax]
    obs['extremities'] = jnp.concatenate(
        [(data.xpos[b] - torso_pos) @ torso_frame
         for b in self._extremities])
    obs['torso_vertical'] = data.xmat[self._thorax, 2]
    obs['com_velocity'] = data.sensordata[self._com_vel_slice]
    obs['velocity'] = data.qvel
    return obs

  def get_reward(self, model, data):
    standing = rewards.tolerance(
        data.xpos[self._head, 2],
        bounds=(_STAND_HEIGHT, float('inf')),
        margin=_STAND_HEIGHT / 4)
    upright = rewards.tolerance(
        data.xmat[self._thorax, 2, 1],
        bounds=(0.9, float('inf')), sigmoid='linear',
        margin=1.9, value_at_margin=0)
    stand_reward = standing * upright
    small_control = rewards.tolerance(
        data.ctrl, margin=1, value_at_margin=0,
        sigmoid='quadratic').mean()
    small_control = (4 + small_control) / 5
    if self._move_speed == 0:
      horizontal_velocity = data.sensordata[self._com_vel_slice][:2]
      dont_move = rewards.tolerance(horizontal_velocity, margin=2).mean()
      return small_control * stand_reward * dont_move
    com_velocity = jnp.linalg.norm(
        data.sensordata[self._com_vel_slice][:2])
    move = rewards.tolerance(
        com_velocity, bounds=(self._move_speed, float('inf')),
        margin=self._move_speed, value_at_margin=0, sigmoid='linear')
    move = (5 * move + 1) / 6
    return small_control * stand_reward * move
