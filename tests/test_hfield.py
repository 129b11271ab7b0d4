"""Heightfield collision: behavioral checks + C-oracle comparison.

The TPU narrowphase treats the field as a smooth bilinear surface
(ops/collision.py _hfield_surface) while the C engine collides against
triangular prisms, so resting states agree to terrain-feature scale,
not solver tolerance — the bands here reflect that.
"""

import numpy as np
import pytest

jax = pytest.importorskip('jax')
import jax.numpy as jnp  # noqa: E402

import dm_control_tpu.models as M  # noqa: E402
from dm_control_tpu.ops import forward  # noqa: E402

_XML = """
<mujoco>
  <asset>
    <hfield name="terrain" nrow="9" ncol="9" size="2 2 0.5 0.1"
            elevation="{elev}"/>
  </asset>
  <option timestep="0.005"/>
  <worldbody>
    <geom name="terrain" type="hfield" hfield="terrain"/>
    <body name="ball" pos="0 0 1">
      <freejoint/>
      <geom name="ball" type="sphere" size="0.1" mass="1"/>
    </body>
  </worldbody>
</mujoco>
"""


def _flat_elev(h):
  return ' '.join([str(h)] * 81)


def test_sphere_rests_on_flat_hfield():
  # constant elevation 1.0 normalizes to... constant data has no range,
  # the compiler keeps it as-is after failed normalization -> use two
  # levels and read the plateau
  elev = np.full((9, 9), 0.5)
  elev[0, 0] = 0.0   # normalization anchor
  xml = _XML.format(elev=' '.join(str(v) for v in elev.reshape(-1)))
  m = M.from_xml_string(xml)
  d = M.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  d = jax.jit(lambda dd: forward.forward(m, dd))(d)
  for _ in range(400):
    d = step(d)
  z = float(d.qpos[2])
  # plateau height = 1.0 (normalized) * ztop 0.5 = 0.5; ball radius 0.1
  assert not bool(d.divergence)
  assert abs(z - 0.6) < 0.02, z


def test_sphere_rolls_downhill():
  # monotonic slope in +x: ball should accelerate toward -x (downhill)
  elev = np.tile(np.linspace(0, 1, 9)[None, :], (9, 1))
  xml = _XML.format(elev=' '.join(str(v) for v in elev.reshape(-1)))
  m = M.from_xml_string(xml)
  d = M.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  d = jax.jit(lambda dd: forward.forward(m, dd))(d)
  for _ in range(300):
    d = step(d)
  assert not bool(d.divergence)
  assert float(d.qpos[0]) < -0.05, float(d.qpos[0])


def test_hfield_vs_oracle_resting_height():
  mujoco = pytest.importorskip('mujoco')
  rng = np.random.RandomState(0)
  elev = rng.uniform(0, 1, (9, 9))
  xml = _XML.format(elev=' '.join(str(v) for v in elev.reshape(-1)))
  mj = mujoco.MjModel.from_xml_string(xml)
  md = mujoco.MjData(mj)
  m = M.from_xml_string(xml)
  d = M.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  d = jax.jit(lambda dd: forward.forward(m, dd))(d)
  for _ in range(600):
    mujoco.mj_step(mj, md)
    d = step(d)
  assert not bool(d.divergence)
  assert np.all(np.isfinite(md.qpos))
  # both engines should settle the ball ON the terrain (same cell) to
  # within the bilinear-vs-prism surface discrepancy
  assert abs(float(d.qpos[2]) - md.qpos[2]) < 0.06, (
      float(d.qpos[2]), md.qpos[2])
