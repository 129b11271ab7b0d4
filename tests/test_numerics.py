"""Analytic/numerical end-to-end tests (model: reference lqr_test.py,
inverse_kinematics_test.py) plus batched/sharded execution tests."""

import numpy as np
import pytest

import jax

from dm_control_tpu import suite
from dm_control_tpu.parallel import BatchedEnvironment
from dm_control_tpu.utils import checkpoint


def test_lqr_optimal_policy_stabilizes():
  from dm_control_tpu.suite import lqr_solver
  env = suite.load('lqr', 'lqr_2_1', task_kwargs={'random': 3})
  p, k, beta = lqr_solver.solve(env)
  assert beta < 1.0
  ts = env.reset()
  state0 = np.concatenate([ts.observation['position'],
                           ts.observation['velocity']])
  n_steps = 400
  for _ in range(n_steps):
    state = np.concatenate([ts.observation['position'],
                            ts.observation['velocity']])
    action = k @ state
    ts = env.step(action.astype(np.float32))
    if ts.last():
      break
  state_final = np.concatenate([ts.observation['position'],
                                ts.observation['velocity']])
  # under the optimal policy the state decays like beta^n (lqr_solver
  # contract); allow generous slack for float32 physics
  bound = max(5 * beta ** n_steps, 1e-3)
  assert np.linalg.norm(state_final) < bound * np.linalg.norm(state0)


def test_inverse_kinematics_reacher():
  from dm_control_tpu import models as M
  from dm_control_tpu.utils import inverse_kinematics as ik
  xml = """
  <mujoco>
    <worldbody>
      <body name="arm" pos="0 0 .5">
        <joint name="shoulder" type="hinge" axis="0 0 1"/>
        <geom type="capsule" fromto="0 0 0 .2 0 0" size=".01"
              mass=".1"/>
        <body name="fore" pos=".2 0 0">
          <joint name="elbow" type="hinge" axis="0 0 1"/>
          <geom type="capsule" fromto="0 0 0 .2 0 0" size=".01"
                mass=".1"/>
          <site name="tip" pos=".2 0 0"/>
        </body>
      </body>
    </worldbody>
  </mujoco>"""
  model = M.from_xml_string(xml)
  target = np.array([0.25, 0.2, 0.5])
  result = ik.qpos_from_site_pose(model, 'tip', target_pos=target,
                                  tol=1e-6, max_steps=200)
  assert result.err_norm < 1e-3, result


def test_checkpoint_roundtrip(tmp_path):
  env = suite.load('pendulum', 'swingup', task_kwargs={'random': 1})
  env.reset()
  env.step(np.array([0.3], dtype=np.float32))
  data = env.data
  path = str(tmp_path / 'state.npz')
  checkpoint.save_state(path, data)
  restored = checkpoint.load_state(path, env.data)
  np.testing.assert_allclose(np.asarray(restored.qpos),
                             np.asarray(data.qpos))


def test_batched_env_rollout():
  env = suite.load('pendulum', 'swingup')
  benv = BatchedEnvironment(env.model, env.task, batch_size=16,
                            time_limit=2.0, seed=1)
  obs = benv.reset()
  assert obs['orientation'].shape == (16, 2)
  actions = np.zeros((16, 1), dtype=np.float32)
  obs, reward, done = benv.step(actions)
  assert reward.shape == (16,)
  assert not bool(np.any(done))
  # run past the time limit: all envs must auto-reset exactly then
  for i in range(99):
    obs, reward, done = benv.step(actions)
  assert bool(np.all(done))
  obs, reward, done = benv.step(actions)
  assert not bool(np.any(done))


def test_batched_rollout_scan():
  env = suite.load('pendulum', 'swingup')
  benv = BatchedEnvironment(env.model, env.task, batch_size=8, seed=0)
  data, total = benv.rollout_random(50)
  assert total.shape == (8,)
  assert np.isfinite(np.asarray(total)).all()


def test_multichip_dryrun():
  import __graft_entry__ as ge
  n = min(8, len(jax.devices()))
  ge.dryrun_multichip(n)
