"""Planar Stacker domain (behavioural parity: reference
suite/stacker.py:16-210).

The model is the reference stacker.xml verbatim (suite/assets/), with
unused boxes removed exactly like the reference make_model. Episode
initialization mirrors the reference's rejection sampling as a bounded
lax.while_loop over collision checks.
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

_CLOSE = .01
_CONTROL_TIMESTEP = .01
_TIME_LIMIT = 10
_ARM_JOINTS = ['arm_root', 'arm_shoulder', 'arm_elbow', 'arm_wrist',
               'finger', 'fingertip', 'thumb', 'thumbtip']

SUITE = containers.TaggedTasks()


def make_model(n_boxes: int = 2) -> str:
  """Reference stacker.xml with unused boxes removed
  (reference suite/stacker.py:41-53)."""
  mjcf = etree.fromstring(common.read_model('stacker.xml'))
  for b in range(n_boxes, 4):
    name = f'box{b}'
    for parent in mjcf.iter():
      for child in list(parent):
        if child.tag == 'body' and child.get('name') == name:
          parent.remove(child)
  return etree.tostring(mjcf, encoding='unicode')


def _make_env(n_boxes, fully_observable, time_limit, random,
              environment_kwargs):
  model = models.from_xml_string(make_model(n_boxes),
                                 assets=common.ASSETS)
  task = Stack(model, n_boxes=n_boxes,
               fully_observable=fully_observable)
  environment_kwargs = environment_kwargs or {}
  return control.Environment(
      model, task, time_limit=time_limit,
      control_timestep=_CONTROL_TIMESTEP, seed=random,
      **environment_kwargs)


@SUITE.add('hard')
def stack_2(fully_observable=True, time_limit=_TIME_LIMIT, random=None,
            environment_kwargs=None):
  """Returns stacker task with 2 boxes."""
  return _make_env(2, fully_observable, time_limit, random,
                   environment_kwargs)


@SUITE.add('hard')
def stack_4(fully_observable=True, time_limit=_TIME_LIMIT, random=None,
            environment_kwargs=None):
  """Returns stacker task with 4 boxes."""
  return _make_env(4, fully_observable, time_limit, random,
                   environment_kwargs)


class Stack(base.Task):
  """Stack the boxes (reference stacker.py:117-210)."""

  def __init__(self, model, n_boxes, fully_observable):
    super().__init__(model)
    self._n_boxes = n_boxes
    self._box_names = [f'box{b}' for b in range(n_boxes)]
    box_joint_names = [f'{n}_{dim}' for n in self._box_names
                       for dim in 'xyz']
    self._fully_observable = fully_observable

    self._arm_qadr = np.array(
        [self.joint_qposadr(n) for n in _ARM_JOINTS])
    self._arm_vadr = np.array(
        [self.joint_dofadr(n) for n in _ARM_JOINTS])
    jnames = model.names.names('joint')
    jids = {n: j for j, n in enumerate(jnames)}
    self._arm_jids = np.array([jids[n] for n in _ARM_JOINTS])
    self._finger_q = self.joint_qposadr('finger')
    self._thumb_q = self.joint_qposadr('thumb')
    self._box_qx = np.array(
        [self.joint_qposadr(f'{n}_x') for n in self._box_names])
    self._box_qz = np.array(
        [self.joint_qposadr(f'{n}_z') for n in self._box_names])
    self._box_qy = np.array(
        [self.joint_qposadr(f'{n}_y') for n in self._box_names])
    self._box_vadr = np.array(
        [self.joint_dofadr(n) for n in box_joint_names])
    self._box_b = np.array([self.body_id(n) for n in self._box_names])
    self._hand_b = self.body_id('hand')
    self._target_b = self.body_id('target')
    self._target_g = self.geom_id('target')
    self._target_s = self.site_id('target')
    self._grasp_s = self.site_id('grasp')
    self._box_s = np.array([self.site_id(n) for n in self._box_names])

  # -------------------------------------------------------------- model
  def randomize_model(self, model, rng):
    """Randomise the target stack location for the episode
    (reference stacker.py:160-164)."""
    kh, kx = jax.random.split(rng)
    dtype = model.body_pos.dtype
    target_height = 2 * jax.random.randint(
        kh, (), 0, self._n_boxes) + 1
    box_size = model.geom_size[self._target_g, 0]
    body_pos = jnp.asarray(model.body_pos)
    body_pos = body_pos.at[self._target_b, 2].set(
        (box_size * target_height).astype(dtype))
    body_pos = body_pos.at[self._target_b, 0].set(
        jax.random.uniform(kx, (), dtype, -.37, .37))
    return model.replace(body_pos=body_pos)

  # ------------------------------------------------------------ episode
  def initialize_episode(self, model, data, rng):
    dtype = data.qpos.dtype
    limited = jnp.asarray(model.jnt_limited)[self._arm_jids]
    jrange = jnp.asarray(model.jnt_range)[self._arm_jids]
    lower = jnp.where(limited > 0, jrange[:, 0], -np.pi).astype(dtype)
    upper = jnp.where(limited > 0, jrange[:, 1], np.pi).astype(dtype)

    def candidate(key):
      ka, kx, kz, ky = jax.random.split(key, 4)
      qpos = jnp.asarray(data.qpos)
      angles = jax.random.uniform(ka, (len(_ARM_JOINTS),), dtype,
                                  lower, upper)
      qpos = qpos.at[self._arm_qadr].set(angles)
      qpos = qpos.at[self._finger_q].set(qpos[self._thumb_q])
      n = self._n_boxes
      qpos = qpos.at[self._box_qx].set(
          jax.random.uniform(kx, (n,), dtype, .1, .3))
      qpos = qpos.at[self._box_qz].set(
          jax.random.uniform(kz, (n,), dtype, 0., .7))
      qpos = qpos.at[self._box_qy].set(
          jax.random.uniform(ky, (n,), dtype, 0., 2 * np.pi))
      return qpos

    def penetrating(qpos):
      d = smooth.kinematics(model, data.replace(qpos=qpos))
      d = coll_ops.collision(model, d)
      return jnp.any(d.contact.active)

    def cond(carry):
      key, qpos, ok, it = carry
      return (~ok) & (it < 200)

    def body(carry):
      key, _, _, it = carry
      key, sub = jax.random.split(key)
      qpos = candidate(sub)
      return (key, qpos, ~penetrating(qpos), it + 1)

    key, sub = jax.random.split(rng)
    qpos0 = candidate(sub)
    _, qpos, _, _ = jax.lax.while_loop(
        cond, body,
        (key, qpos0, ~penetrating(qpos0), jnp.zeros((), jnp.int32)))
    return data.replace(qpos=qpos, qvel=jnp.zeros_like(data.qvel))

  # -------------------------------------------------------- observations
  def _body_2d_pose(self, data, b, orientation=True):
    pos = data.xpos[b][..., jnp.array([0, 2])]
    if not orientation:
      return pos
    ori = data.xquat[b][..., jnp.array([0, 2])]
    return jnp.concatenate([pos, ori], axis=-1)

  def get_observation(self, model, data):
    obs = collections.OrderedDict()
    arm_q = data.qpos[self._arm_qadr]
    obs['arm_pos'] = jnp.stack(
        [jnp.sin(arm_q), jnp.cos(arm_q)], axis=-1)
    obs['arm_vel'] = data.qvel[self._arm_vadr]
    obs['touch'] = jnp.log1p(data.sensordata)
    if self._fully_observable:
      obs['hand_pos'] = self._body_2d_pose(data, self._hand_b)
      obs['box_pos'] = self._body_2d_pose(data, jnp.asarray(self._box_b))
      obs['box_vel'] = data.qvel[self._box_vadr]
      obs['target_pos'] = self._body_2d_pose(data, self._target_b,
                                             orientation=False)
    return obs

  # -------------------------------------------------------------- reward
  def get_reward(self, model, data):
    box_size = model.geom_size[self._target_g, 0]
    dists = jnp.stack(
        [jnp.linalg.norm(data.site_xpos[s] -
                         data.site_xpos[self._target_s])
         for s in self._box_s])
    box_is_close = rewards.tolerance(jnp.min(dists),
                                     margin=2 * box_size)
    hand_to_target = jnp.linalg.norm(
        data.site_xpos[self._grasp_s] - data.site_xpos[self._target_s])
    hand_is_far = rewards.tolerance(hand_to_target,
                                    bounds=(.1, float('inf')),
                                    margin=_CLOSE)
    return box_is_close * hand_is_far
