"""Numerical parity tests against the C MuJoCo oracle (mujoco pip pkg).

Strategy (see SURVEY.md §4): the reference has no physics-oracle tests
because it *is* the oracle; here we load the same MJCF into both engines,
set identical (qpos, qvel, ctrl), and compare one-step/forward outputs.
One-step comparisons test correctness without chaotic divergence.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.parity

jax = pytest.importorskip('jax')
jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp  # noqa: E402

import dm_control_tpu.models as M  # noqa: E402
from dm_control_tpu.ops import forward  # noqa: E402

mujoco = pytest.importorskip('mujoco')

import os as _os
_SUITE_DIR = _os.path.join(_os.path.dirname(__file__), '..',
                          'dm_control_tpu', 'suite', 'assets')

# contact-free (or effectively smooth) models, tolerance for 1 step
SMOOTH_MODELS = ['pendulum.xml', 'acrobot.xml', 'cartpole.xml',
                 'point_mass.xml', 'reacher.xml']
# models exercising contacts (plane-capsule, friction pyramids, limits)
CONTACT_MODELS = ['hopper.xml', 'walker.xml', 'cheetah.xml']


def _load_pair(fname):
  path = os.path.join(_SUITE_DIR, fname)
  mj = mujoco.MjModel.from_xml_path(path)
  m = M.from_xml_string(open(path).read(), base_dir=_SUITE_DIR,
                        dtype=jnp.float64)
  return mj, m


def _random_state(mj, seed):
  rng = np.random.RandomState(seed)
  qpos = rng.uniform(-0.5, 0.5, size=mj.nq)
  # keep quaternions valid
  for j in range(mj.njnt):
    t = mj.jnt_type[j]
    adr = mj.jnt_qposadr[j]
    if t == mujoco.mjtJoint.mjJNT_FREE:
      q = rng.randn(4)
      qpos[adr + 3:adr + 7] = q / np.linalg.norm(q)
    elif t == mujoco.mjtJoint.mjJNT_BALL:
      q = rng.randn(4)
      qpos[adr:adr + 4] = q / np.linalg.norm(q)
  qvel = rng.uniform(-1, 1, size=mj.nv)
  ctrl = rng.uniform(-1, 1, size=mj.nu)
  return qpos, qvel, ctrl


@pytest.mark.parametrize('fname', SMOOTH_MODELS)
def test_compile_parity(fname):
  mj, m = _load_pair(fname)
  assert m.nq == mj.nq and m.nv == mj.nv and m.nu == mj.nu
  assert m.nbody == mj.nbody and m.ngeom == mj.ngeom
  np.testing.assert_allclose(m.body_mass, mj.body_mass, atol=1e-9)
  # compare full inertia tensors (component order is frame-dependent)
  def _full(inertia, iquat):
    out = []
    for i in range(len(inertia)):
      q = np.asarray(iquat[i], dtype=np.float64)
      w, x, y, z = q
      r = np.array([
          [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
           2 * (x * z + w * y)],
          [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
           2 * (y * z - w * x)],
          [2 * (x * z - w * y), 2 * (y * z + w * x),
           1 - 2 * (x * x + y * y)]])
      out.append(r @ np.diag(np.asarray(inertia[i])) @ r.T)
    return np.stack(out)
  np.testing.assert_allclose(_full(m.body_inertia, m.body_iquat),
                             _full(mj.body_inertia, mj.body_iquat),
                             atol=1e-9)
  np.testing.assert_allclose(m.body_ipos, mj.body_ipos, atol=1e-9)
  np.testing.assert_allclose(m.qpos0, mj.qpos0, atol=1e-12)
  np.testing.assert_allclose(m.dof_invweight0, mj.dof_invweight0,
                             rtol=1e-6, atol=1e-9)
  np.testing.assert_allclose(m.body_invweight0, mj.body_invweight0,
                             rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize('fname', SMOOTH_MODELS)
@pytest.mark.parametrize('seed', [0, 1])
def test_forward_parity(fname, seed):
  mj, m = _load_pair(fname)
  md = mujoco.MjData(mj)
  qpos, qvel, ctrl = _random_state(mj, seed)
  md.qpos[:] = qpos
  md.qvel[:] = qvel
  md.ctrl[:] = ctrl
  mujoco.mj_forward(mj, md)

  d = M.make_data(m, dtype=jnp.float64)
  d = d.replace(qpos=jnp.array(qpos), qvel=jnp.array(qvel),
                ctrl=jnp.array(ctrl))
  d = jax.jit(forward.forward, static_argnums=())(m, d)

  np.testing.assert_allclose(d.xpos, md.xpos, atol=1e-8)
  np.testing.assert_allclose(d.xipos, md.xipos, atol=1e-8)
  np.testing.assert_allclose(
      np.abs(np.asarray(d.xquat)), np.abs(md.xquat), atol=1e-7)
  np.testing.assert_allclose(d.qfrc_bias, md.qfrc_bias,
                             rtol=1e-6, atol=1e-7)
  np.testing.assert_allclose(d.qfrc_passive, md.qfrc_passive,
                             rtol=1e-6, atol=1e-8)
  np.testing.assert_allclose(d.qfrc_actuator, md.qfrc_actuator,
                             rtol=1e-6, atol=1e-8)
  np.testing.assert_allclose(d.qacc, md.qacc, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize('fname', CONTACT_MODELS)
def test_contact_forward_parity(fname):
  """Drop the body toward the floor; compare constrained dynamics."""
  mj, m = _load_pair(fname)
  md = mujoco.MjData(mj)
  qpos = mj.qpos0.copy()
  # lower the root vertical dof until some geom penetrates the floor
  rng = np.random.RandomState(0)
  qvel = rng.uniform(-0.1, 0.1, size=mj.nv)
  md.qpos[:] = qpos
  md.qvel[:] = qvel
  mujoco.mj_forward(mj, md)
  # drop: lower the root until the oracle reports contacts
  vertical = 1 if fname != 'walker.xml' else 0  # rootz dof index
  for _ in range(300):
    qpos[vertical] -= 0.01
    md.qpos[:] = qpos
    mujoco.mj_forward(mj, md)
    if md.ncon > 0:
      break
  assert md.ncon > 0, 'test setup: expected contacts'

  d = M.make_data(m, dtype=jnp.float64)
  d = d.replace(qpos=jnp.array(qpos), qvel=jnp.array(qvel))
  d = jax.jit(forward.forward)(m, d)
  active = np.asarray(d.contact.active)
  assert active.sum() == md.ncon
  np.testing.assert_allclose(
      np.sort(np.asarray(d.contact.dist)[active]),
      np.sort(md.contact.dist[:md.ncon]), atol=1e-9)
  np.testing.assert_allclose(d.qacc, md.qacc, rtol=1e-5, atol=1e-6)

  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(5):
    mujoco.mj_step(mj, md)
    d = step(d)
    np.testing.assert_allclose(d.qpos, md.qpos, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(d.qvel, md.qvel, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize('fname', SMOOTH_MODELS)
def test_step_parity(fname):
  mj, m = _load_pair(fname)
  md = mujoco.MjData(mj)
  qpos, qvel, ctrl = _random_state(mj, 2)
  md.qpos[:] = qpos
  md.qvel[:] = qvel
  md.ctrl[:] = ctrl

  d = M.make_data(m, dtype=jnp.float64)
  d = d.replace(qpos=jnp.array(qpos), qvel=jnp.array(qvel),
                ctrl=jnp.array(ctrl))

  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(3):
    mujoco.mj_step(mj, md)
    d = step(d)
    np.testing.assert_allclose(d.qpos, md.qpos, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(d.qvel, md.qvel, rtol=1e-4, atol=1e-6)


def test_rangefinder_parity():
  xml = """
  <mujoco><worldbody>
    <geom name="floor" type="plane" size="5 5 .1"/>
    <body name="b" pos="0 0 1">
      <joint type="slide" axis="0 0 1"/>
      <geom type="box" size=".05 .05 .05" mass="1"/>
      <site name="rf_down" pos="0 0 -.06" zaxis="0 0 -1"/>
      <site name="rf_up" pos="0 0 .06" zaxis="0 0 1"/>
      <site name="rf_side" pos=".06 0 0" zaxis="1 0 0"/>
    </body>
    <body name="obstacle" pos="1.5 0 1">
      <geom name="ball" type="sphere" size=".3" mass="1"/>
    </body>
  </worldbody>
  <sensor>
    <rangefinder name="rf_down" site="rf_down"/>
    <rangefinder name="rf_up" site="rf_up"/>
    <rangefinder name="rf_side" site="rf_side"/>
  </sensor></mujoco>"""
  mj = mujoco.MjModel.from_xml_string(xml)
  md = mujoco.MjData(mj)
  mujoco.mj_forward(mj, md)
  m = M.from_xml_string(xml, dtype=jnp.float64)
  d = jax.jit(forward.forward)(m, M.make_data(m, dtype=jnp.float64))
  np.testing.assert_allclose(d.sensordata, md.sensordata, atol=1e-9)


def test_box_box_aligned_stack_parity():
  xml = """
  <mujoco><option timestep="0.002"/><worldbody>
    <geom name="floor" type="plane" size="3 3 .1"/>
    <body name="b1" pos="0 0 .1"><freejoint/>
      <geom name="box1" type="box" size=".1 .12 .1" mass="1"/></body>
    <body name="b2" pos=".05 .02 .295"><freejoint/>
      <geom name="box2" type="box" size=".1 .08 .1" mass=".5"/></body>
  </worldbody></mujoco>"""
  mj = mujoco.MjModel.from_xml_string(xml)
  md = mujoco.MjData(mj)
  mujoco.mj_forward(mj, md)
  m = M.from_xml_string(xml, dtype=jnp.float64)
  d = jax.jit(forward.forward)(m, M.make_data(m, dtype=jnp.float64))
  np.testing.assert_allclose(d.qacc, md.qacc, rtol=1e-6, atol=1e-8)
