"""Tests for the Physics wrapper + named indexing (L2 parity surface)."""

import numpy as np
import pytest

from dm_control_tpu.mujoco import Physics, PhysicsError

_XML = """
<mujoco model="t">
  <option timestep="0.01"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 .1"/>
    <body name="arm" pos="0 0 1">
      <joint name="shoulder" type="hinge" axis="0 1 0" damping=".1"/>
      <geom name="upper" type="capsule" fromto="0 0 0 0 0 -.4"
            size=".04" mass=".5"/>
      <body name="wrist" pos="0 0 -.4">
        <joint name="elbow" type="hinge" axis="0 1 0"/>
        <geom name="lower" type="capsule" fromto="0 0 0 0 0 -.3"
              size=".03" mass=".3"/>
        <site name="tip" pos="0 0 -.3"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor name="shoulder" joint="shoulder" gear="10"
           ctrllimited="true" ctrlrange="-1 1"/>
  </actuator>
  <sensor>
    <jointpos name="shoulder_pos" joint="shoulder"/>
  </sensor>
</mujoco>
"""


@pytest.fixture(scope='module')
def physics():
  return Physics.from_xml_string(_XML)


def test_named_read(physics):
  physics.reset()
  assert physics.named.data.qpos['shoulder'] == 0.0
  np.testing.assert_allclose(physics.named.data.xpos['arm'],
                             [0, 0, 1], atol=1e-6)
  # column access on matrices
  assert abs(physics.named.data.xmat['arm', 'zz'] - 1.0) < 1e-6


def test_named_write_and_forward(physics):
  physics.reset()
  physics.named.data.qpos['shoulder'] = np.pi / 2
  physics.forward()
  # wrist should now hang horizontally: x displaced from arm
  tip = physics.named.data.site_xpos['tip']
  assert abs(tip[0]) > 0.3


def test_step_advances_time(physics):
  physics.reset()
  t0 = physics.time()
  physics.step(5)
  np.testing.assert_allclose(physics.time() - t0, 0.05, atol=1e-6)


def test_state_roundtrip(physics):
  physics.reset()
  physics.named.data.qvel['shoulder'] = 0.5  # break equilibrium
  physics.forward()
  physics.step(3)
  state = physics.get_state()
  p2 = physics.copy()
  p2.step(2)
  assert not np.allclose(p2.get_state(), state)
  p2.set_state(state)
  p2.forward()
  np.testing.assert_allclose(p2.get_state(), state, atol=1e-6)


def test_set_control(physics):
  physics.reset()
  physics.set_control(np.array([0.7], dtype=np.float32))
  physics.step()
  np.testing.assert_allclose(physics.control(), [0.7], atol=1e-6)
  # actuator_force is pre-gear (mjData semantics); joint force = gear*f
  np.testing.assert_allclose(
      physics.named.data.actuator_force['shoulder'], 0.7, atol=1e-4)
  np.testing.assert_allclose(
      physics.named.data.qfrc_actuator['shoulder'], 7.0, atol=1e-3)


def test_sensordata_named(physics):
  physics.reset()
  physics.named.data.qpos['shoulder'] = 0.3
  physics.forward()
  np.testing.assert_allclose(
      physics.named.data.sensordata['shoulder_pos'], 0.3, atol=1e-6)


def test_model_named(physics):
  np.testing.assert_allclose(
      physics.named.model.actuator_ctrlrange['shoulder'], [-1, 1])
  assert physics.named.model.body_mass['wrist'] > 0


def test_pickle_roundtrip(physics):
  import pickle
  physics.reset()
  physics.step(2)
  blob = pickle.dumps(physics)
  p2 = pickle.loads(blob)
  np.testing.assert_allclose(p2.get_state(), physics.get_state(),
                             atol=1e-7)


def test_divergence_raises():
  p = Physics.from_xml_string(_XML)
  p.named.data.qvel['shoulder'] = 1e308
  with pytest.raises(PhysicsError):
    p.step()
