"""LQR domain (behavioural parity: reference suite/lqr.py).

Chains of masses on sliders with springs; quadratic reward. The optimal
linear policy is computable in closed form (see lqr_solver), which makes
this domain an analytic end-to-end correctness test for the engine.
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

_DEFAULT_TIME_LIMIT = float('inf')
_CONTROL_COST_COEF = 0.1
SUITE = containers.TaggedTasks()


def make_model(n_bodies: int, n_actuators: int,
               rng: np.random.RandomState,
               stiffness_range=(15, 25), damping_range=(0, 0)) -> str:
  """Reference lqr.xml with the mass-spring chain added procedurally
  (reference suite/lqr.py:110-201 `_make_body`/`_make_model`)."""
  if n_bodies < 1 or n_actuators < 1:
    raise ValueError('at least 1 body and 1 actuator required')
  if n_actuators > n_bodies:
    raise ValueError('at most 1 actuator per body')

  mjcf = etree.fromstring(common.read_model('lqr.xml'))
  parent = mjcf.find('./worldbody')
  actuator = etree.SubElement(mjcf, 'actuator')
  tendon = etree.SubElement(mjcf, 'tendon')

  for body in range(n_bodies):
    child = etree.Element('body', name=f'body_{body}', pos='.25 0 0')
    joint = etree.SubElement(child, 'joint', name=f'joint_{body}')
    child.append(etree.Element('geom', name=f'geom_{body}'))
    joint.set('stiffness', str(rng.uniform(*stiffness_range)))
    joint.set('damping', str(rng.uniform(*damping_range)))
    site_name = f'site_{body}'
    child.append(etree.Element('site', name=site_name))
    if body == 0:
      child.set('pos', '.25 0 .1')
    if body < n_actuators:
      actuator.append(etree.Element('motor', name=f'motor_{body}',
                                    joint=f'joint_{body}'))
    if body < n_bodies - 1:
      # visualization-only tendon between consecutive bodies
      spatial = etree.SubElement(tendon, 'spatial',
                                 name=f'tendon_{body}')
      spatial.append(etree.Element('site', site=site_name))
      spatial.append(etree.Element('site', site=f'site_{body + 1}'))
    parent.append(child)
    parent = child

  return etree.tostring(mjcf, encoding='unicode')


def _make_lqr(n_bodies, n_actuators, control_cost_coef, time_limit,
              random, environment_kwargs):
  rng = (random if isinstance(random, np.random.RandomState)
         else np.random.RandomState(random))
  model = models.from_xml_string(make_model(n_bodies, n_actuators, rng),
                                 assets=common.ASSETS)
  task = LQRLevel(model, control_cost_coef)
  environment_kwargs = environment_kwargs or {}
  seed = int(rng.randint(2 ** 31 - 1))
  return control.Environment(model, task, time_limit=time_limit,
                             seed=seed, **environment_kwargs)


@SUITE.add()
def lqr_2_1(time_limit=_DEFAULT_TIME_LIMIT, random=None,
            environment_kwargs=None):
  """LQR with 2 bodies, first actuated."""
  return _make_lqr(2, 1, _CONTROL_COST_COEF, time_limit, random,
                   environment_kwargs)


@SUITE.add()
def lqr_6_2(time_limit=_DEFAULT_TIME_LIMIT, random=None,
            environment_kwargs=None):
  """LQR with 6 bodies, first two actuated."""
  return _make_lqr(6, 2, _CONTROL_COST_COEF, time_limit, random,
                   environment_kwargs)


class LQRLevel(base.Task):
  """Quadratic state + control cost; terminates near the origin."""

  _TERMINAL_TOL = 1e-6

  def __init__(self, model, control_cost_coef):
    if control_cost_coef <= 0:
      raise ValueError('control_cost_coef must be positive.')
    super().__init__(model)
    self._control_cost_coef = control_cost_coef

  @property
  def control_cost_coef(self):
    return self._control_cost_coef

  def initialize_episode(self, model, data, rng):
    unit = jax.random.normal(rng, (model.nq,), dtype=data.qpos.dtype)
    qpos = jnp.sqrt(2.0) * unit / jnp.linalg.norm(unit)
    return data.replace(qpos=qpos)

  def get_observation(self, model, data):
    obs = collections.OrderedDict()
    obs['position'] = data.qpos
    obs['velocity'] = data.qvel
    return obs

  def get_reward(self, model, data):
    state_cost = 0.5 * jnp.dot(data.qpos, data.qpos)
    control_cost = 0.5 * jnp.dot(data.ctrl, data.ctrl)
    return 1 - (state_cost + control_cost * self._control_cost_coef)

  def get_termination(self, model, data):
    state_norm = jnp.sqrt(jnp.dot(data.qpos, data.qpos) +
                          jnp.dot(data.qvel, data.qvel))
    return state_norm < self._TERMINAL_TOL
