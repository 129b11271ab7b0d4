"""Sharded-vs-vmap numerical parity on the flagship rollout path.

The multi-chip story: `BatchedEnvironment(..., mesh=mesh)` shards the
env batch axis over a `jax.sharding.Mesh`; the physics is identical to
the single-device vmap path, so observations/rewards must agree to
floating-point reproducibility. Runs on the 8 virtual CPU devices set
up in conftest.py.
"""

import jax
import numpy as np
import pytest

from dm_control_tpu import suite
from dm_control_tpu.parallel import sharding as shd
from dm_control_tpu.parallel.batch_env import BatchedEnvironment

BATCH = 16
N_STEPS = 3


@pytest.fixture(scope='module')
def humanoid_model_task():
  env = suite.load('humanoid', 'run')
  return env.model, env.task


def _run(model, task, mesh):
  benv = BatchedEnvironment(model, task, batch_size=BATCH, seed=0,
                            n_sub_steps=5, mesh=mesh)
  obs = benv.reset()
  rng = np.random.RandomState(42)
  rewards, dones = [], []
  for _ in range(N_STEPS):
    actions = rng.uniform(-0.3, 0.3,
                          (BATCH, int(model.nu))).astype(np.float32)
    obs, reward, done = benv.step(actions)
    rewards.append(np.asarray(jax.device_get(reward)))
    dones.append(np.asarray(jax.device_get(done)))
  flat_obs = {k: np.asarray(jax.device_get(v)) for k, v in obs.items()}
  return np.stack(rewards), np.stack(dones), flat_obs


def test_sharded_matches_vmap_humanoid(humanoid_model_task):
  model, task = humanoid_model_task
  assert len(jax.devices()) >= 8, 'conftest must provide 8 cpu devices'
  mesh = shd.make_mesh(8)

  r_sharded, d_sharded, obs_sharded = _run(model, task, mesh)
  r_vmap, d_vmap, obs_vmap = _run(model, task, None)

  assert np.all(np.isfinite(r_sharded))
  for v in obs_sharded.values():
    assert np.all(np.isfinite(v))
  # Partitioned compilation tiles reductions differently (16-env vs
  # 2-env program shapes), so per-element f32 results differ at the
  # last ulp. Contact dynamics amplify that chaotically: the Newton
  # convergence test and the top-K contact selection both branch on
  # those last ulps, and once a single contact flips, per-element
  # trajectories diverge at O(1) within a few substeps (measured: one
  # env in 16 crosses a bifurcation inside 15 substeps). Per-element
  # trajectory equality at this horizon is therefore not a meaningful
  # contract; numerical sharding correctness is covered at the
  # one-substep horizon by test_sharded_single_substep_tight. Here we
  # assert the STATISTICS agree: batch-mean reward per control step.
  np.testing.assert_allclose(r_sharded.mean(axis=1), r_vmap.mean(axis=1),
                             rtol=0.0, atol=0.05)


def test_sharded_single_substep_tight(humanoid_model_task):
  """One physics substep, sharded vs vmap, at near-fp-tight tolerance.

  A single constraint-solved substep has no chaotic amplification: any
  disagreement beyond reduction-order noise is a real sharding bug
  (wrong collective, stale shard, mismatched program).
  """
  model, task = humanoid_model_task
  mesh = shd.make_mesh(8)
  rng = np.random.RandomState(7)
  actions = rng.uniform(-0.3, 0.3,
                        (BATCH, int(model.nu))).astype(np.float32)

  outs = []
  for m in (mesh, None):
    benv = BatchedEnvironment(model, task, batch_size=BATCH, seed=0,
                              n_sub_steps=1, mesh=m)
    benv.reset()
    obs, reward, done = benv.step(actions)
    outs.append({k: np.asarray(jax.device_get(v))
                 for k, v in obs.items()})
  # Band: the Newton solve stops on a cost-decrease threshold, so a
  # last-ulp tiling difference can add/remove one final iteration whose
  # step is below the cost tolerance but ~1e-5-scale in qacc — that is
  # the solver's own accuracy contract, not a sharding bug. Anything
  # beyond it (stale shard, wrong collective) shows up at O(1).
  for k in outs[0]:
    np.testing.assert_allclose(
        outs[0][k], outs[1][k], rtol=1e-3, atol=5e-5,
        err_msg=f'single-substep observation {k} diverged')


def test_sharded_rollout_random(humanoid_model_task):
  model, task = humanoid_model_task
  mesh = shd.make_mesh(8)
  benv = BatchedEnvironment(model, task, batch_size=BATCH, seed=1,
                            n_sub_steps=5, mesh=mesh)
  data, total = benv.rollout_random(n_steps=3)
  total = np.asarray(jax.device_get(total))
  assert total.shape == (BATCH,)
  assert np.all(np.isfinite(total))
  # the state stayed sharded over the mesh
  leaf = jax.tree_util.tree_leaves(benv._state)[0]
  assert len(leaf.sharding.device_set) == 8
