"""The suite's user-facing demo entry points run end to end."""

import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip('jax')

pytestmark = pytest.mark.heavy


def test_mocap_demo_headless(tmp_path):
  from dm_control_tpu.suite.demos import mocap_demo
  out = str(tmp_path / 'video.npy')
  video = mocap_demo.main(['--max_num_frames', '3', '--width', '64',
                           '--height', '64', '--out', out])
  assert video.shape[1:] == (64, 128, 3) and video.shape[0] >= 1
  assert os.path.exists(out)
  assert np.asarray(video).std() > 0


def test_explore_loader_builds():
  """explore's loader path: build the env + wrapper it would view."""
  from dm_control_tpu.suite import explore
  names = explore._all_names()
  assert 'cartpole.balance' in names
  # drive main() far enough to construct the loader without the viewer
  from dm_control_tpu import suite
  from dm_control_tpu.suite.wrappers import action_noise
  env = suite.load('cartpole', 'balance')
  env = action_noise.Wrapper(env, scale=0.1)
  ts = env.reset()
  ts = env.step(np.zeros(env.action_spec().shape))
  assert ts.observation is not None
