"""Multi-step trajectory parity vs the C MuJoCo oracle.

One-step parity (test_oracle_parity.py) proves each pipeline stage is
correct; these tests prove the *closed-loop trajectory* stays on the
oracle's trajectory — the BASELINE.json requirement ("trajectories match
C MuJoCo within solver tolerance"). Models are the reference suite XMLs
loaded verbatim (reference dm_control/suite/*.xml).

Tolerance bands (calibrated empirically, f64, 2026-08):
  * smooth models track at machine precision (~1e-15) for 100+ steps;
  * contact models track at ~1e-15 until a contact-activation flip
    amplifies roundoff (walker ~step 60, humanoid ~step 30 under the
    sinusoidal excitation used here) — chaotic divergence, not error:
    the same flip happens between two C MuJoCo builds. Each model
    asserts machine-precision tracking for a horizon safely inside its
    measured divergence onset, with a 1e-9 band (~6 orders of headroom
    over the measured drift, ~6 below post-divergence error).
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

# (model file, steps to hold the band, qpos band). finger runs its
# elliptic-cone contacts through the Gauss-Newton middle-zone Hessian,
# which converges to solver tolerance rather than machine precision.
CASES = [
    ('pendulum.xml', 100, 1e-9),
    ('acrobot.xml', 100, 1e-9),
    ('cartpole.xml', 100, 1e-9),
    ('point_mass.xml', 100, 1e-9),
    ('reacher.xml', 100, 1e-9),
    ('swimmer.xml', 100, 1e-9),
    ('ball_in_cup.xml', 100, 1e-9),
    ('fish.xml', 100, 1e-9),
    ('finger.xml', 100, 1e-6),
    ('hopper.xml', 80, 1e-9),
    ('walker.xml', 50, 1e-9),
    ('cheetah.xml', 80, 1e-9),
    ('humanoid.xml', 12, 1e-9),
]

VTOL_FACTOR = 100.0


@pytest.mark.parametrize('fname,nsteps,qtol', CASES)
def test_trajectory_parity(fname, nsteps, qtol):
  path = os.path.join(_SUITE_DIR, fname)
  mj = mujoco.MjModel.from_xml_path(path)
  m = M.from_xml_string(open(path).read(), base_dir=_SUITE_DIR,
                        dtype=jnp.float64)
  md = mujoco.MjData(mj)

  rng = np.random.RandomState(0)
  md.qpos[:] = mj.qpos0 + 0.01 * rng.randn(mj.nq)
  for j in range(mj.njnt):
    t = mj.jnt_type[j]
    if t in (mujoco.mjtJoint.mjJNT_FREE, mujoco.mjtJoint.mjJNT_BALL):
      adr = mj.jnt_qposadr[j] + (
          3 if t == mujoco.mjtJoint.mjJNT_FREE else 0)
      q = md.qpos[adr:adr + 4]
      md.qpos[adr:adr + 4] = q / np.linalg.norm(q)
  md.qvel[:] = 0.05 * rng.randn(mj.nv)
  phase = rng.uniform(0, 2 * np.pi, mj.nu)

  d = M.make_data(m).replace(qpos=jnp.asarray(md.qpos.copy()),
                             qvel=jnp.asarray(md.qvel.copy()))
  step = jax.jit(lambda dd: forward.step(m, dd))
  mujoco.mj_forward(mj, md)
  d = jax.jit(lambda dd: forward.forward(m, dd))(d)

  for t in range(nsteps):
    ctrl = 0.4 * np.sin(0.01 * t + phase)
    md.ctrl[:] = ctrl
    d = d.replace(ctrl=jnp.asarray(ctrl))
    mujoco.mj_step(mj, md)
    d = step(d)
    qerr = np.max(np.abs(np.asarray(d.qpos) - md.qpos))
    verr = np.max(np.abs(np.asarray(d.qvel) - md.qvel))
    assert qerr < qtol, f'{fname}: qpos drift {qerr:.3e} at step {t}'
    assert verr < qtol * VTOL_FACTOR, (
        f'{fname}: qvel drift {verr:.3e} at step {t}')
