"""Planar Manipulator domain (behavioural parity: reference
suite/manipulator.py:16-289).

The model is the reference manipulator.xml verbatim (suite/assets/),
with unused props removed exactly like the reference make_model
(reference suite/manipulator.py:46-68). Episode initialization mirrors
the reference's rejection sampling (randomise arm/object until nothing
penetrates) as a bounded lax.while_loop over collision checks.
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

_CLOSE = .01          # (meters) distance below which a thing is "close"
_CONTROL_TIMESTEP = .01
_TIME_LIMIT = 10
_P_IN_HAND = .1       # probability of object-in-hand initial state
_P_IN_TARGET = .1     # probability of object-in-target initial state
_ARM_JOINTS = ['arm_root', 'arm_shoulder', 'arm_elbow', 'arm_wrist',
               'finger', 'fingertip', 'thumb', 'thumbtip']
_ALL_PROPS = frozenset(['ball', 'target_ball', 'cup',
                        'peg', 'target_peg', 'slot'])
_TOUCH_SENSORS = ['palm_touch', 'finger_touch', 'thumb_touch',
                  'fingertip_touch', 'thumbtip_touch']

SUITE = containers.TaggedTasks()


def make_model(use_peg: bool = False, insert: bool = False) -> str:
  """Reference manipulator.xml with unused props removed
  (reference suite/manipulator.py:46-68)."""
  mjcf = etree.fromstring(common.read_model('manipulator.xml'))
  if use_peg:
    required_props = ['peg', 'target_peg']
    if insert:
      required_props += ['slot']
  else:
    required_props = ['ball', 'target_ball']
    if insert:
      required_props += ['cup']

  for unused in _ALL_PROPS.difference(required_props):
    for parent in mjcf.iter():
      for child in list(parent):
        if child.tag == 'body' and child.get('name') == unused:
          parent.remove(child)
  return etree.tostring(mjcf, encoding='unicode')


def _make_env(use_peg, insert, fully_observable, time_limit, random,
              environment_kwargs):
  model = models.from_xml_string(make_model(use_peg, insert),
                                 assets=common.ASSETS)
  task = Bring(model, use_peg=use_peg, insert=insert,
               fully_observable=fully_observable)
  environment_kwargs = environment_kwargs or {}
  return control.Environment(
      model, task, time_limit=time_limit,
      control_timestep=_CONTROL_TIMESTEP, seed=random,
      **environment_kwargs)


@SUITE.add('benchmarking', 'hard')
def bring_ball(fully_observable=True, time_limit=_TIME_LIMIT,
               random=None, environment_kwargs=None):
  """Returns manipulator bring task with the ball prop."""
  return _make_env(False, False, fully_observable, time_limit, random,
                   environment_kwargs)


@SUITE.add('hard')
def bring_peg(fully_observable=True, time_limit=_TIME_LIMIT,
              random=None, environment_kwargs=None):
  """Returns manipulator bring task with the peg prop."""
  return _make_env(True, False, fully_observable, time_limit, random,
                   environment_kwargs)


@SUITE.add('hard')
def insert_ball(fully_observable=True, time_limit=_TIME_LIMIT,
                random=None, environment_kwargs=None):
  """Returns manipulator insert task with the ball prop."""
  return _make_env(False, True, fully_observable, time_limit, random,
                   environment_kwargs)


@SUITE.add('hard')
def insert_peg(fully_observable=True, time_limit=_TIME_LIMIT,
               random=None, environment_kwargs=None):
  """Returns manipulator insert task with the peg prop."""
  return _make_env(True, True, fully_observable, time_limit, random,
                   environment_kwargs)


class Bring(base.Task):
  """Bring the prop to the target (reference manipulator.py:157-289)."""

  def __init__(self, model, use_peg, insert, fully_observable):
    super().__init__(model)
    self._use_peg = use_peg
    self._target = 'target_peg' if use_peg else 'target_ball'
    self._object = 'peg' if use_peg else 'ball'
    self._object_joints = [f'{self._object}_{dim}' for dim in 'xzy']
    self._receptacle = 'slot' if use_peg else 'cup'
    self._insert = insert
    self._fully_observable = fully_observable

    self._arm_qadr = np.array(
        [self.joint_qposadr(n) for n in _ARM_JOINTS])
    self._arm_vadr = np.array(
        [self.joint_dofadr(n) for n in _ARM_JOINTS])
    jnames = model.names.names('joint')
    jids = {n: j for j, n in enumerate(jnames)}
    self._arm_jids = np.array([jids[n] for n in _ARM_JOINTS])
    self._obj_qadr = np.array(
        [self.joint_qposadr(n) for n in self._object_joints])
    self._obj_vadr = np.array(
        [self.joint_dofadr(n) for n in self._object_joints])
    self._finger_q = self.joint_qposadr('finger')
    self._thumb_q = self.joint_qposadr('thumb')
    self._touch = [self.sensor_slice(n) for n in _TOUCH_SENSORS]
    self._hand_b = self.body_id('hand')
    self._object_b = self.body_id(self._object)
    self._target_b = self.body_id(self._target)
    if insert:
      self._receptacle_b = self.body_id(self._receptacle)
    self._grasp_s = self.site_id('grasp')
    self._pinch_s = self.site_id('pinch')
    sites = {}
    for n in ('peg', 'target_peg', 'peg_grasp', 'peg_pinch', 'peg_tip',
              'target_peg_tip') if use_peg else ('ball', 'target_ball'):
      sites[n] = self.site_id(n)
    self._sites = sites

  # -------------------------------------------------------------- model
  def randomize_model(self, model, rng):
    """Randomise the target (and receptacle) pose for the episode
    (reference manipulator.py:205-219)."""
    kx, kz, ka = jax.random.split(rng, 3)
    dtype = model.body_pos.dtype
    target_x = jax.random.uniform(kx, (), dtype, -.4, .4)
    target_z = jax.random.uniform(kz, (), dtype, .1, .4)
    if self._insert:
      angle = jax.random.uniform(ka, (), dtype, -np.pi / 3, np.pi / 3)
    else:
      angle = jax.random.uniform(ka, (), dtype, -np.pi, np.pi)
    quat = jnp.stack([jnp.cos(angle / 2), jnp.zeros((), dtype),
                      jnp.sin(angle / 2), jnp.zeros((), dtype)])
    body_pos = jnp.asarray(model.body_pos)
    body_quat = jnp.asarray(model.body_quat)
    for b in ([self._target_b, self._receptacle_b] if self._insert
              else [self._target_b]):
      body_pos = body_pos.at[b, 0].set(target_x)
      body_pos = body_pos.at[b, 2].set(target_z)
      body_quat = body_quat.at[b].set(quat)
    return model.replace(body_pos=body_pos, body_quat=body_quat)

  # ------------------------------------------------------------ episode
  def initialize_episode(self, model, data, rng):
    """Rejection-sample a collision-free configuration
    (reference manipulator.py:186-245)."""
    dtype = data.qpos.dtype
    target_x = model.body_pos[self._target_b, 0]
    target_z = model.body_pos[self._target_b, 2]
    target_angle = 2 * jnp.arctan2(model.body_quat[self._target_b, 2],
                                   model.body_quat[self._target_b, 0])

    limited = jnp.asarray(model.jnt_limited)[self._arm_jids]
    jrange = jnp.asarray(model.jnt_range)[self._arm_jids]
    lower = jnp.where(limited > 0, jrange[:, 0], -np.pi).astype(dtype)
    upper = jnp.where(limited > 0, jrange[:, 1], np.pi).astype(dtype)

    def candidate(key):
      ka, kc, ko, kv = jax.random.split(key, 4)
      qpos = jnp.asarray(data.qpos)
      angles = jax.random.uniform(ka, (len(_ARM_JOINTS),), dtype,
                                  lower, upper)
      qpos = qpos.at[self._arm_qadr].set(angles)
      # symmetrize hand
      qpos = qpos.at[self._finger_q].set(qpos[self._thumb_q])

      # object placement: in_hand / in_target / uniform
      init_type = jax.random.choice(
          kc, 3, p=jnp.array([_P_IN_HAND, _P_IN_TARGET,
                              1 - _P_IN_HAND - _P_IN_TARGET]))
      # grasp-site pose after arm FK (reference after_reset analogue)
      d_fk = smooth.kinematics(model, data.replace(qpos=qpos))
      grasp_pos = d_fk.site_xpos[self._grasp_s]
      gx = d_fk.site_xmat[self._grasp_s, 0, 0]
      gz = d_fk.site_xmat[self._grasp_s, 2, 0]
      hand_angle = np.pi - jnp.arctan2(gz, gx)

      ku1, ku2, ku3 = jax.random.split(ko, 3)
      ux = jax.random.uniform(ku1, (), dtype, -.5, .5)
      uz = jax.random.uniform(ku2, (), dtype, 0., .7)
      ua = jax.random.uniform(ku3, (), dtype, 0., 2 * np.pi)

      ox = jnp.where(init_type == 0, grasp_pos[0],
                     jnp.where(init_type == 1, target_x, ux))
      oz = jnp.where(init_type == 0, grasp_pos[2],
                     jnp.where(init_type == 1, target_z, uz))
      oa = jnp.where(init_type == 0, hand_angle,
                     jnp.where(init_type == 1, target_angle, ua))
      qpos = qpos.at[self._obj_qadr].set(
          jnp.stack([ox, oz, oa]).astype(dtype))
      qvel = jnp.zeros_like(data.qvel)
      qvel = qvel.at[self._obj_vadr[0]].set(
          jnp.where(init_type == 2,
                    jax.random.uniform(kv, (), dtype, -5., 5.), 0.))
      return qpos, qvel

    def penetrating(qpos):
      d = smooth.kinematics(model, data.replace(qpos=qpos))
      d = coll_ops.collision(model, d)
      return jnp.any(d.contact.active)

    def cond(carry):
      key, qpos, qvel, ok, it = carry
      return (~ok) & (it < 200)

    def body(carry):
      key, _, _, _, it = carry
      key, sub = jax.random.split(key)
      qpos, qvel = candidate(sub)
      return (key, qpos, qvel, ~penetrating(qpos), it + 1)

    key, sub = jax.random.split(rng)
    qpos0, qvel0 = candidate(sub)
    _, qpos, qvel, _, _ = jax.lax.while_loop(
        cond, body, (key, qpos0, qvel0, ~penetrating(qpos0),
                     jnp.zeros((), jnp.int32)))
    return data.replace(qpos=qpos, qvel=qvel)

  # -------------------------------------------------------- observations
  def _body_2d_pose(self, data, b):
    pos = data.xpos[b, jnp.array([0, 2])]
    ori = data.xquat[b, jnp.array([0, 2])]
    return jnp.concatenate([pos, ori])

  def get_observation(self, model, data):
    obs = collections.OrderedDict()
    arm_q = data.qpos[self._arm_qadr]
    obs['arm_pos'] = jnp.stack(
        [jnp.sin(arm_q), jnp.cos(arm_q)], axis=-1)
    obs['arm_vel'] = data.qvel[self._arm_vadr]
    obs['touch'] = jnp.log1p(jnp.concatenate(
        [data.sensordata[s] for s in self._touch]))
    if self._fully_observable:
      obs['hand_pos'] = self._body_2d_pose(data, self._hand_b)
      obs['object_pos'] = self._body_2d_pose(data, self._object_b)
      obs['object_vel'] = data.qvel[self._obj_vadr]
      obs['target_pos'] = self._body_2d_pose(data, self._target_b)
    return obs

  # -------------------------------------------------------------- reward
  def _site_distance(self, data, s1, s2):
    return jnp.linalg.norm(data.site_xpos[s1] - data.site_xpos[s2])

  def _is_close(self, distance):
    return rewards.tolerance(distance, (0, _CLOSE), _CLOSE * 2)

  def get_reward(self, model, data):
    if self._use_peg:
      s = self._sites
      grasp = self._is_close(
          self._site_distance(data, s['peg_grasp'], self._grasp_s))
      pinch = self._is_close(
          self._site_distance(data, s['peg_pinch'], self._pinch_s))
      grasping = (grasp + pinch) / 2
      bring = self._is_close(
          self._site_distance(data, s['peg'], s['target_peg']))
      bring_tip = self._is_close(
          self._site_distance(data, s['target_peg_tip'], s['peg_tip']))
      bringing = (bring + bring_tip) / 2
      return jnp.maximum(bringing, grasping / 3)
    s = self._sites
    return self._is_close(
        self._site_distance(data, s['ball'], s['target_ball']))
