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
  np.testing.assert_allclose(r_sharded, r_vmap, rtol=1e-5, atol=1e-6)
  np.testing.assert_array_equal(d_sharded, d_vmap)
  # partitioned compilation reorders reductions; after 15 contact-solver
  # substeps individual f32 velocity elements can differ by ~1e-5
  for k in obs_vmap:
    np.testing.assert_allclose(
        obs_sharded[k], obs_vmap[k], rtol=1e-3, atol=1e-4,
        err_msg=f'observation {k} diverged between sharded and vmap')


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
