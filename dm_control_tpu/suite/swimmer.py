"""Swimmer domain (behavioural parity: reference suite/swimmer.py).

Procedurally generates an n-link swimmer; locomotion forces come from
the medium-density fluid drag model (option density=3000).
"""

import collections
from xml.etree import ElementTree as etree

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu import models
from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite import common
from dm_control_tpu.utils import containers
from dm_control_tpu.utils import rewards

_DEFAULT_TIME_LIMIT = 30
_CONTROL_TIMESTEP = .03
SUITE = containers.TaggedTasks()


def make_model(n_bodies: int) -> str:
  """Reference swimmer.xml with the body chain, actuators, and sensors
  added procedurally (reference suite/swimmer.py:83-121 `_make_model`)."""
  if n_bodies < 3:
    raise ValueError(f'at least 3 bodies required, got {n_bodies}')
  mjcf = etree.fromstring(common.read_model('swimmer.xml'))
  head_body = mjcf.find('./worldbody/body')
  actuator = etree.SubElement(mjcf, 'actuator')
  sensor = etree.SubElement(mjcf, 'sensor')

  parent = head_body
  for body_index in range(n_bodies - 1):
    site_name = f'site_{body_index}'
    child = etree.Element('body', name=f'segment_{body_index}',
                          pos='0 .1 0')
    etree.SubElement(child, 'geom', {'class': 'visual',
                                     'name': f'visual_{body_index}'})
    etree.SubElement(child, 'geom', {'class': 'inertial',
                                     'name': f'inertial_{body_index}'})
    child.append(etree.Element('site', name=site_name))
    joint_name = f'joint_{body_index}'
    joint_limit = 360.0 / n_bodies
    child.append(etree.Element(
        'joint', {'name': joint_name,
                  'range': f'{-joint_limit} {joint_limit}'}))
    actuator.append(etree.Element('motor', name=f'motor_{body_index}',
                                  joint=joint_name))
    sensor.append(etree.Element(
        'velocimeter', name=f'velocimeter_{body_index}', site=site_name))
    sensor.append(etree.Element(
        'gyro', name=f'gyro_{body_index}', site=site_name))
    parent.append(child)
    parent = child

  # scale the tracking cameras to the swimmer's length
  cameras = mjcf.findall('./worldbody/body/camera')
  scale = n_bodies / 6.0
  for cam in cameras:
    if cam.get('mode') == 'trackcom':
      old_pos = cam.get('pos').split(' ')
      cam.set('pos', ' '.join(str(float(dim) * scale)
                              for dim in old_pos))
  return etree.tostring(mjcf, encoding='unicode')



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
  model = models.from_xml_string(make_model(n_joints), assets=common.ASSETS)
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
