"""Batched-execution consistency: vmap(step) must equal single step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dm_control_tpu.models as M
from dm_control_tpu.ops import forward

_XML = """
<mujoco model="bat">
  <option timestep="0.005"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 .1"/>
    <body name="b" pos="0 0 .3">
      <freejoint/>
      <geom name="ball" type="sphere" size=".1" mass="1"
            friction=".8 .01 .001"/>
    </body>
  </worldbody>
</mujoco>
"""


@pytest.fixture(scope='module')
def model():
  return M.from_xml_string(_XML)


def test_vmap_matches_single(model):
  batch = 5
  rng = np.random.RandomState(0)
  qpos = np.tile(np.asarray(model.qpos0), (batch, 1)).astype(np.float32)
  qpos[:, 2] = np.linspace(0.05, 0.4, batch)   # varying drop heights
  qvel = rng.uniform(-0.5, 0.5, (batch, model.nv)).astype(np.float32)

  step = jax.jit(lambda d: forward.step(model, d))
  vstep = jax.jit(jax.vmap(lambda d: forward.step(model, d)))

  d0 = M.make_data(model)
  batch_data = jax.vmap(
      lambda q, v: d0.replace(qpos=q, qvel=v))(qpos, qvel)
  singles = []
  for i in range(batch):
    d = d0.replace(qpos=qpos[i], qvel=qvel[i])
    for _ in range(3):
      d = step(d)
    singles.append(np.asarray(d.qpos))
  for _ in range(3):
    batch_data = vstep(batch_data)
  np.testing.assert_allclose(np.asarray(batch_data.qpos),
                             np.stack(singles), rtol=2e-5, atol=1e-6)


def test_free_body_falls_and_rests(model):
  """Ball dropped on the plane settles at its radius height."""
  d = M.make_data(model)
  step = jax.jit(lambda dd: forward.step(model, dd))
  for _ in range(400):
    d = step(d)
  z = float(d.qpos[2])
  assert 0.08 < z < 0.12, z
  assert abs(float(d.qvel[2])) < 0.05


def test_quaternion_norm_preserved(model):
  d = M.make_data(model)
  d = d.replace(qvel=jnp.asarray(
      np.array([0.1, 0, 2.0, 3.0, 2.0, 1.0], np.float32)))
  step = jax.jit(lambda dd: forward.step(model, dd))
  for _ in range(200):
    d = step(d)
  qnorm = float(jnp.linalg.norm(d.qpos[3:7]))
  np.testing.assert_allclose(qnorm, 1.0, atol=1e-4)
  assert not bool(d.divergence)
