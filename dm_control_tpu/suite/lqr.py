"""LQR domain (behavioural parity: reference suite/lqr.py).

Chains of masses on sliders with springs; quadratic reward. The optimal
linear policy is computable in closed form (see lqr_solver), which makes
this domain an analytic end-to-end correctness test for the engine.
"""

import collections

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu import models
from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.utils import containers

_DEFAULT_TIME_LIMIT = float('inf')
_CONTROL_COST_COEF = 0.1
SUITE = containers.TaggedTasks()


def make_model(n_bodies: int, n_actuators: int,
               rng: np.random.RandomState,
               stiffness_range=(15, 25), damping_range=(0, 0)) -> str:
  """Chain of sphere masses on y-sliders with random joint springs."""
  if n_bodies < 1 or n_actuators < 1:
    raise ValueError('at least 1 body and 1 actuator required')
  if n_actuators > n_bodies:
    raise ValueError('at most 1 actuator per body')

  body_xml = ''
  indent = '    '
  for i in range(n_bodies):
    k = rng.uniform(*stiffness_range)
    c = rng.uniform(*damping_range)
    pos = '.25 0 .1' if i == 0 else '.25 0 0'
    body_xml += (f'\n{indent}<body name="body_{i}" pos="{pos}">'
                 f'\n{indent}  <joint name="joint_{i}" stiffness="{k}"'
                 f' damping="{c}"/>'
                 f'\n{indent}  <geom name="geom_{i}"/>'
                 f'\n{indent}  <site name="site_{i}"/>')
    indent += '  '
  for i in range(n_bodies):
    indent = indent[:-2]
    body_xml += f'\n{indent}</body>'

  actuators = '\n'.join(
      f'    <motor name="motor_{i}" joint="joint_{i}"/>'
      for i in range(n_actuators))

  return f"""
<mujoco model="LQR">
  <option timestep=".03">
    <flag constraint="disable"/>
  </option>
  <default>
    <joint type="slide" axis="0 1 0"/>
    <geom type="sphere" size=".1"/>
    <site size=".01"/>
  </default>
  <worldbody>
    <geom name="floor" size="4 1 .2" type="plane"/>{body_xml}
  </worldbody>
  <actuator>
{actuators}
  </actuator>
</mujoco>
"""


def _make_lqr(n_bodies, n_actuators, control_cost_coef, time_limit,
              random, environment_kwargs):
  rng = (random if isinstance(random, np.random.RandomState)
         else np.random.RandomState(random))
  model = models.from_xml_string(make_model(n_bodies, n_actuators, rng))
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
