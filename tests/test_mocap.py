"""Mocap stack tests: HDF5 loading, trajectory windows, tracking task.

Mirrors the reference's loader_test.py / tracking_test.py strategy: a
synthetic clip recorded from the walker's own physics guarantees zero
initialization error, then the tracking env is stepped end-to-end.
"""

import os

import numpy as np
import pytest

from dm_control_tpu import composer
from dm_control_tpu import mjcf
from dm_control_tpu.locomotion.arenas import floors
from dm_control_tpu.locomotion.mocap import loader as mocap_loader
from dm_control_tpu.locomotion.mocap import trajectory as trajectory_lib
from dm_control_tpu.locomotion.tasks.reference_pose import tracking
from dm_control_tpu.locomotion.tasks.reference_pose import types
from dm_control_tpu.locomotion.tasks.reference_pose import utils as rp_utils
from dm_control_tpu.locomotion.walkers import ant

_REF_H5 = '/root/reference/dm_control/locomotion/mocap/test_trajectories.h5'

N_STEPS = 24
SUBSTEPS = 5


@pytest.mark.skipif(not os.path.exists(_REF_H5),
                    reason='reference test data unavailable')
def test_hdf5_loader_reads_reference_layout():
  loader = mocap_loader.HDF5TrajectoryLoader(_REF_H5)
  assert loader.keys() == ('cmuv2019_001', 'cmuv2019_002')
  traj = loader.get_trajectory('cmuv2019_001')
  assert traj.dt == pytest.approx(0.05)
  assert traj.num_steps == 10
  d = traj.as_dict()
  assert d['walker/joints'].shape == (10, 56)
  assert d['walker/body_positions'].shape == (10, 30, 3)
  assert d['walker/body_quaternions'].shape == (10, 30, 4)
  assert d['prop/position'].shape == (10, 3)
  # final-step velocities zeroed by default
  assert np.all(d['walker/joints_velocity'][-1] == 0)
  traj2 = loader.get_trajectory('cmuv2019_001', zero_out_velocities=False)
  assert not np.all(traj2.as_dict()['walker/joints_velocity'][-1] == 0)
  # windowing
  win = loader.get_trajectory('cmuv2019_001', start_step=2, end_step=8)
  assert win.num_steps == 7  # end_step is inclusive via end_time quantize
  info = traj.clip_data.walker_infos[0]
  assert info['model'] == trajectory_lib.WALKER_MODEL_CMU_2019
  assert len(info['markers']) == 5
  assert info['markers'][0]['parent'] == 'lhumerus'
  prop_info = traj.clip_data.prop_infos[0]
  assert prop_info['shape'] == trajectory_lib.PROP_SHAPE_BOX


def _record_ant_clip():
  """Records a zero-action rollout of an attached Ant as a ClipData."""
  arena = floors.Floor()
  walker = rp_utils.add_walker(ant.Ant, arena)
  physics = mjcf.Physics.from_mjcf_model(arena.mjcf_model)
  physics.forward()
  dt = physics.timestep() * SUBSTEPS
  frames = []
  for _ in range(N_STEPS):
    frames.append(rp_utils.get_features(physics, walker))
    for _ in range(SUBSTEPS):
      physics.step()
  fields = {}
  for key in frames[0]:
    arr = np.stack([np.asarray(f[key], dtype=float).reshape(-1)
                    for f in frames])
    fields[key] = arr
  return trajectory_lib.ClipData(
      identifier='ant_clip', dt=dt, walkers=[fields],
      walker_infos=[{'name': 'ant', 'model': 0, 'mass': 0.0,
                     'markers': (), 'scaling': ()}])


@pytest.fixture(scope='module')
def ant_clip():
  return _record_ant_clip()


def test_trajectory_window_and_features(ant_clip):
  traj = trajectory_lib.Trajectory(ant_clip)
  assert traj.num_steps == N_STEPS
  d = traj.as_dict()
  assert d['walker/position'].shape == (N_STEPS, 3)
  walker_feats, prop_feats = traj.get_timestep_features(0.0)
  assert not prop_feats
  np.testing.assert_allclose(walker_feats[0]['position'],
                             d['walker/position'][0])


def test_multi_clip_mocap_tracking_steps(ant_clip):
  task = tracking.MultiClipMocapTracking(
      walker=ant.Ant,
      arena=floors.Floor(),
      ref_path={'ant_clip': ant_clip},
      ref_steps=(1, 2),
      dataset=types.ClipCollection(ids=('ant_clip',)),
      min_steps=4,
      reward_type='comic',
      physics_timestep=ant_clip.dt / SUBSTEPS,
      loader_class=mocap_loader.DictTrajectoryLoader,
  )
  env = composer.Environment(task=task, random_state=7,
                             strip_singleton_obs_buffer_dim=True)
  timestep = env.reset()
  obs = timestep.observation
  for key in ('walker/reference_rel_joints',
              'walker/reference_rel_bodies_pos_local',
              'walker/reference_rel_root_quat',
              'walker/time_in_clip',
              'walker/clip_id'):
    assert key in obs, sorted(obs)
  n_ref = 2
  n_joints = len(task._walker.mocap_joints)
  assert obs['walker/reference_rel_joints'].shape[-1] == n_ref * n_joints

  spec = env.action_spec()
  action = np.zeros(spec.shape)
  rewards = []
  for _ in range(5):
    timestep = env.step(action)
    rewards.append(timestep.reward)
    if timestep.last():
      break
  assert all(np.isfinite(r) for r in rewards)
  # zero-action replay of the recorded zero-action clip tracks well
  assert rewards[0] > 0.5


def test_playback_task_overrides_pose(ant_clip):
  task = tracking.PlaybackTask(
      walker=ant.Ant,
      arena=floors.Floor(),
      ref_path={'ant_clip': ant_clip},
      dataset=types.ClipCollection(ids=('ant_clip',)),
      physics_timestep=ant_clip.dt / SUBSTEPS,
      loader_class=mocap_loader.DictTrajectoryLoader,
  )
  env = composer.Environment(task=task, random_state=3,
                             strip_singleton_obs_buffer_dim=True)
  env.reset()
  spec = env.action_spec()
  timestep = env.step(np.zeros(spec.shape))
  assert timestep.reward == 0.0
  # the walker pose is pinned to the clip each step
  expected = ant_clip.walkers[0]['position'][task._time_step]
  pos, _ = task._walker.get_pose(env.physics)
  np.testing.assert_allclose(pos, expected, atol=1e-3)
