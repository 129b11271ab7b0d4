"""Integrator semantics: implicitfast oracle parity; implicit raises.

VERDICT r04 item 8: the compiler accepted integrator="implicitfast" /
"implicit" but step() silently ran Euler. implicitfast now solves
(M + h D) qacc = qfrc with D = -∂qfrc/∂qvel (joint damping, tendon
damping, actuator velocity gains — oracle mj_implicitSkip semantics);
plain implicit (which additionally needs ∂RNE/∂qvel) raises.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.parity

jax = pytest.importorskip('jax')
jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp  # noqa: E402

import dm_control_tpu.models as M  # noqa: E402
from dm_control_tpu.ops import forward  # noqa: E402

mujoco = pytest.importorskip('mujoco')

_XML = """
<mujoco>
  <option timestep="0.005" integrator="{integrator}"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.3"/>
      <geom type="capsule" size="0.05" fromto="0 0 0 0.4 0 0"/>
      <body pos="0.4 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" damping="0.1"/>
        <geom type="capsule" size="0.04" fromto="0 0 0 0.3 0 0"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <velocity joint="j1" kv="2.0"/>
    <position joint="j2" kp="5" kv="0.4"/>
  </actuator>
</mujoco>
"""


def test_implicitfast_trajectory_parity():
  xml = _XML.format(integrator='implicitfast')
  mj = mujoco.MjModel.from_xml_string(xml)
  m = M.from_xml_string(xml, dtype=jnp.float64)
  md = mujoco.MjData(mj)

  rng = np.random.RandomState(1)
  md.qpos[:] = 0.2 * rng.randn(mj.nq)
  md.qvel[:] = 0.3 * rng.randn(mj.nv)
  mujoco.mj_forward(mj, md)

  d = M.make_data(m, dtype=jnp.float64)
  d = d.replace(qpos=jnp.asarray(md.qpos), qvel=jnp.asarray(md.qvel))
  step = jax.jit(lambda dd: forward.step(m, dd))
  for i in range(100):
    ctrl = np.array([0.5 * np.sin(0.07 * i), 0.3 * np.cos(0.05 * i)])
    md.ctrl[:] = ctrl
    d = step(d.replace(ctrl=jnp.asarray(ctrl)))
    mujoco.mj_step(mj, md)
  np.testing.assert_allclose(np.asarray(d.qpos), md.qpos, atol=1e-9)
  np.testing.assert_allclose(np.asarray(d.qvel), md.qvel, atol=1e-7)


def test_implicitfast_more_stable_than_euler_semantics():
  """implicitfast must actually branch (not silently run Euler)."""
  xml_if = _XML.format(integrator='implicitfast')
  m_if = M.from_xml_string(xml_if, dtype=jnp.float64)
  xml_eu = _XML.format(integrator='Euler')
  m_eu = M.from_xml_string(xml_eu, dtype=jnp.float64)
  d0 = M.make_data(m_if, dtype=jnp.float64)
  d0 = d0.replace(qpos=jnp.array([0.4, -0.3]),
                  qvel=jnp.array([1.0, -2.0]),
                  ctrl=jnp.array([0.5, 0.2]))
  d_if = jax.jit(lambda dd: forward.step(m_if, dd))(d0)
  d_eu = jax.jit(lambda dd: forward.step(m_eu, dd))(d0)
  # the actuator kv terms enter the implicit solve only on the
  # implicitfast path, so one step must differ measurably
  assert float(jnp.max(jnp.abs(d_if.qvel - d_eu.qvel))) > 1e-8


def test_implicit_raises():
  xml = _XML.format(integrator='implicit')
  m = M.from_xml_string(xml, dtype=jnp.float64)
  d = M.make_data(m, dtype=jnp.float64)
  with pytest.raises(NotImplementedError):
    forward.step(m, d)
