"""Oracle parity for (a) dog — the mesh-collision flagship — and
(b) a composer-BUILT model (attach/namescope/mjcf -> compiler path).

VERDICT r04 item 5: the parity lane thinned exactly where the risk is:
dog (convex-mesh MPR contacts) had no oracle check at all, and nothing
covered a model that went through the composer/mjcf compile path.
"""

import os

import numpy as np
import pytest

pytestmark = [pytest.mark.parity, pytest.mark.heavy]

jax = pytest.importorskip('jax')
jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp  # noqa: E402

import dm_control_tpu.models as M  # noqa: E402
from dm_control_tpu.ops import forward  # noqa: E402

mujoco = pytest.importorskip('mujoco')

_ASSETS = os.path.join(os.path.dirname(__file__), '..',
                       'dm_control_tpu', 'suite', 'assets')


def _dog_pair():
  from dm_control_tpu.suite import dog as dog_module
  xml = dog_module.make_model(floor_size=10, remove_ball=True)
  # the oracle resolves includes/meshes relative to the file location,
  # so materialize the patched XML inside the assets dir
  tmp = os.path.join(_ASSETS, '_tmp_dog_parity.xml')
  with open(tmp, 'w') as f:
    f.write(xml)
  try:
    mj = mujoco.MjModel.from_xml_path(tmp)
  finally:
    os.remove(tmp)
  m = M.from_xml_string(xml, base_dir=_ASSETS, dtype=jnp.float64)
  return mj, m


def test_dog_contact_rich_qacc_parity():
  """One-step qacc at an oracle-settled, mesh-contact-rich dog state.

  The dog's feet are convex meshes resolved by the MPR kernel
  (ops/mpr.py) against the floor plane; the contact positions/normals
  differ from libccd's at the vertex level, so the band is wider than
  the primitive flagships' — but the accelerations must agree to
  solver-tolerance scale, and the standing contact set must match.
  """
  mj, m = _dog_pair()
  md = mujoco.MjData(mj)
  mujoco.mj_resetData(mj, md)
  for _ in range(300):
    mujoco.mj_step(mj, md)
  mujoco.mj_forward(mj, md)
  assert md.ncon > 0, 'expected the settled dog to stand on contacts'
  assert np.all(np.isfinite(md.qacc))

  d = M.make_data(m, dtype=jnp.float64)
  d = d.replace(qpos=jnp.array(md.qpos), qvel=jnp.array(md.qvel),
                ctrl=jnp.array(md.ctrl), act=jnp.array(md.act))
  d = jax.jit(forward.forward)(m, d)

  assert bool(jnp.all(jnp.isfinite(d.qacc)))
  # Decomposed contract (diagnosed 2026-08, tools history):
  #   * smooth dynamics match to ~3e-6 relative L2;
  #   * the CONTACT SET matches exactly — same geom pairs, same
  #     penetration depths (1e-6), same normals/friction/solparams;
  #   * contact POSITIONS differ by up to ~2cm on the flat foot-mesh
  #     faces: several hull vertices tie at the same depth and the two
  #     engines keep different equal-depth subsets, which shifts lever
  #     arms and gives percent-level qacc differences at a transient
  #     state. That tie-break is not a defined behavior of either
  #     engine, so qacc is banded in relative L2 (behavioral parity is
  #     covered by test_dog_short_horizon_stability).
  rel_sm = (np.linalg.norm(np.asarray(d.qacc_smooth) - md.qacc_smooth)
            / max(np.linalg.norm(md.qacc_smooth), 1e-9))
  assert rel_sm < 1e-4, f'dog qacc_smooth relative L2 {rel_sm:.2e}'
  active_mask = np.asarray(d.contact.active)
  assert int(active_mask.sum()) == md.ncon
  np.testing.assert_allclose(
      np.sort(np.asarray(d.contact.dist)[active_mask]),
      np.sort(md.contact.dist[:md.ncon]), atol=1e-6)
  rel_l2 = (np.linalg.norm(np.asarray(d.qacc) - md.qacc) /
            max(np.linalg.norm(md.qacc), 1e-9))
  assert rel_l2 < 0.35, f'dog qacc relative L2 error {rel_l2:.3f}'


def test_dog_short_horizon_stability():
  """Closed-loop: from the oracle-settled state, our engine keeps the
  dog standing (trunk height) for 100 steps like the oracle does."""
  mj, m = _dog_pair()
  md = mujoco.MjData(mj)
  mujoco.mj_resetData(mj, md)
  for _ in range(300):
    mujoco.mj_step(mj, md)

  d = M.make_data(m, dtype=jnp.float64)
  d = d.replace(qpos=jnp.array(md.qpos), qvel=jnp.array(md.qvel))
  step = jax.jit(lambda dd: forward.step(m, dd))
  z0 = float(md.qpos[2])
  for _ in range(100):
    d = step(d)
    mujoco.mj_step(mj, md)
  z_ours = float(np.asarray(d.qpos)[2])
  z_oracle = float(md.qpos[2])
  assert abs(z_ours - z0) < 0.1, (z_ours, z0)
  assert abs(z_ours - z_oracle) < 0.05, (z_ours, z_oracle)


def _composer_pair():
  """An ant walker on a composer Floor, built through mjcf attach."""
  from dm_control_tpu.locomotion.arenas import floors
  from dm_control_tpu.locomotion.walkers import ant
  from dm_control_tpu import mjcf

  arena = floors.Floor()
  walker = ant.Ant()
  walker.create_root_joints(arena.attach(walker))
  root = arena.mjcf_model
  xml = root.to_xml_string()
  assets = root.get_assets()
  mj = mujoco.MjModel.from_xml_string(xml, dict(assets))
  m = M.from_xml_string(xml, assets=dict(assets), dtype=jnp.float64)
  return mj, m


def test_composer_built_model_qacc_parity():
  """The attach/namescope/compile path produces the oracle's physics."""
  mj, m = _composer_pair()
  md = mujoco.MjData(mj)
  mujoco.mj_resetData(mj, md)
  # drop the ant onto the floor and settle into contacts
  md.qpos[2] = 0.3
  for _ in range(300):
    mujoco.mj_step(mj, md)
  mujoco.mj_forward(mj, md)
  assert md.ncon > 0

  d = M.make_data(m, dtype=jnp.float64)
  d = d.replace(qpos=jnp.array(md.qpos), qvel=jnp.array(md.qvel))
  d = jax.jit(forward.forward)(m, d)
  np.testing.assert_allclose(np.asarray(d.qacc), md.qacc,
                             rtol=2e-4, atol=1e-4)

  # 3-step golden through the composer-compiled model
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(3):
    mujoco.mj_step(mj, md)
    d = step(d)
    np.testing.assert_allclose(np.asarray(d.qpos), md.qpos,
                               rtol=1e-4, atol=1e-6)
