"""Convex (MPR) narrowphase parity vs the C oracle.

The C engine routes these pairs through libccd's MPR; the TPU kernel
(ops/mpr.py) must agree on hit/miss classification everywhere and on
dist/normal in the shallow-contact regime the solver operates in.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mujoco

from dm_control_tpu.models import constants
from dm_control_tpu.ops import mpr as mpr_lib

_G = constants.GeomType
_TMAP = {'sphere': _G.SPHERE, 'capsule': _G.CAPSULE,
         'ellipsoid': _G.ELLIPSOID, 'cylinder': _G.CYLINDER,
         'box': _G.BOX}

_PAIRS = [
    ('ellipsoid', [0.05, 0.08, 0.12], 'cylinder', [0.06, 0.1]),
    ('ellipsoid', [0.05, 0.08, 0.12], 'ellipsoid', [0.1, 0.07, 0.05]),
    ('box', [0.08, 0.1, 0.06], 'cylinder', [0.06, 0.1]),
    ('capsule', [0.04, 0.1], 'ellipsoid', [0.1, 0.07, 0.05]),
]


def _oracle(t1, s1, t2, s2):
  xml = f"""<mujoco><option><flag gravity="disable"/></option><worldbody>
      <body><geom type="{t1}" size="{' '.join(map(str, s1))}"/></body>
      <body><freejoint/>
        <geom type="{t2}" size="{' '.join(map(str, s2))}"/></body>
    </worldbody></mujoco>"""
  mc = mujoco.MjModel.from_xml_string(xml)
  return mc, mujoco.MjData(mc)


@pytest.mark.parametrize('t1,s1,t2,s2', _PAIRS)
def test_mpr_vs_oracle(t1, s1, t2, s2):
  mc, dc = _oracle(t1, s1, t2, s2)
  kern = jax.jit(mpr_lib.make_kernel(int(_TMAP[t1]), int(_TMAP[t2])))
  rng = np.random.RandomState(3)
  pad = lambda s: jnp.asarray(np.pad(s, (0, 3 - len(s))),
                              dtype=jnp.float64)
  V = jnp.zeros((1, 3), dtype=jnp.float64)
  n_shallow = 0
  for _ in range(120):
    pos = rng.uniform(-0.15, 0.15, 3)
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    dc.qpos[:3] = pos
    dc.qpos[3:7] = q
    mujoco.mj_forward(mc, dc)
    odist = None
    for ci in range(dc.ncon):
      c = dc.contact[ci]
      if {c.geom1, c.geom2} == {0, 1} and (odist is None
                                           or c.dist < odist):
        odist = c.dist
        onorm = c.frame[:3].copy()
        if c.geom1 == 1:
          onorm = -onorm
    dd, _, nn = kern(
        jnp.zeros(3, jnp.float64), jnp.eye(3, dtype=jnp.float64),
        pad(s1), V,
        jnp.asarray(dc.geom_xpos[1], jnp.float64),
        jnp.asarray(dc.geom_xmat[1].reshape(3, 3), jnp.float64),
        pad(s2), V, jnp.asarray(0.0, jnp.float64))
    ours_hit = bool(dd[0] < 0)
    oracle_hit = odist is not None and odist < 0
    assert ours_hit == oracle_hit
    if oracle_hit and -0.02 < odist:
      n_shallow += 1
      assert abs(float(dd[0]) - odist) < 5e-3
      assert float(np.dot(np.asarray(nn[0]), onorm)) > 0.5
  assert n_shallow >= 10  # the tolerance assertions actually ran


def test_mesh_hull_support():
  """Box-as-mesh must agree with the analytic box support."""
  import itertools
  corners = np.array(list(itertools.product([-0.1, 0.1], [-0.07, 0.07],
                                            [-0.05, 0.05])))
  kern = jax.jit(mpr_lib.make_kernel(int(_G.SPHERE), int(_G.MESH)))
  V = jnp.asarray(corners, dtype=jnp.float64)
  # sphere of radius .05 penetrating the +x face by .01
  dd, pp, nn = kern(
      jnp.asarray([0.14, 0.0, 0.0], jnp.float64),
      jnp.eye(3, dtype=jnp.float64),
      jnp.asarray([0.05, 0, 0], jnp.float64), jnp.zeros((1, 3)),
      jnp.zeros(3, jnp.float64), jnp.eye(3, dtype=jnp.float64),
      jnp.zeros(3, jnp.float64), V, jnp.asarray(0.0, jnp.float64))
  assert abs(float(dd[0]) + 0.01) < 1e-6
  # normal from sphere (g1) to box (g2): -x
  assert np.allclose(np.asarray(nn[0]), [-1, 0, 0], atol=1e-5)
  assert abs(float(pp[0][0]) - 0.0950) < 1e-3


def test_dog_model_compiles_with_parity():
  """The dog model (162 STL bone meshes, condim-6 teeth, filter
  actuators) compiles with oracle-exact mass/inertia and qacc parity
  (reference suite/dog.py:97-148 consumes it)."""
  import warnings
  from dm_control_tpu import models as M
  from dm_control_tpu.ops import forward
  path = os.path.join(os.path.dirname(__file__), '..', 'dm_control_tpu',
                      'suite', 'assets', 'dog.xml')
  mc = mujoco.MjModel.from_xml_path(path)
  dc = mujoco.MjData(mc)
  with warnings.catch_warnings():
    warnings.simplefilter('ignore')
    m = M.from_xml_path(path, dtype=jnp.float64)
  np.testing.assert_allclose(np.asarray(m.body_mass), mc.body_mass,
                             atol=1e-10)
  np.testing.assert_allclose(np.asarray(m.body_inertia),
                             mc.body_inertia, rtol=1e-6, atol=5e-9)
  d = M.make_data(m, dtype=jnp.float64)
  d = jax.jit(lambda dd: forward.forward(m, dd))(d)
  mujoco.mj_forward(mc, dc)
  scale = max(1.0, np.max(np.abs(dc.qacc)))
  # x64 is disabled in the test process, so this actually runs f32:
  # 5e-6 normalized is ~40 ULP of the f32 scaled mass factorization
  np.testing.assert_allclose(np.asarray(d.qacc) / scale,
                             dc.qacc / scale, atol=5e-6)
