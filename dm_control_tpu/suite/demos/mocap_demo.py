"""Demonstration of amc parsing for the CMU mocap database.

Behavioral contract: reference suite/demos/mocap_demo.py — parse a
.amc clip, convert it to humanoid_CMU qpos trajectories at the
environment's control timestep, and play it back frame by frame. The
reference displays through matplotlib; on a headless TPU host this
writes the stitched two-camera frames to an .npy video file (or shows
them with matplotlib when a display is available).

    python -m dm_control_tpu.suite.demos.mocap_demo \
        --filename=path/to/mocap.amc --out=/tmp/mocap_video.npy

CMU motion capture clips are available at mocap.cs.cmu.edu; the
bundled zeros.amc (reference test asset) exercises the pipeline.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
  from dm_control_tpu.suite import humanoid_CMU
  from dm_control_tpu.suite.utils import parse_amc

  parser = argparse.ArgumentParser(description=__doc__)
  default_clip = os.path.join(os.path.dirname(__file__), 'zeros.amc')
  parser.add_argument('--filename', default=default_clip,
                      help='amc file to be converted')
  parser.add_argument('--max_num_frames', type=int, default=90)
  parser.add_argument('--width', type=int, default=240)
  parser.add_argument('--height', type=int, default=240)
  parser.add_argument('--out', default=None,
                      help='write frames to this .npy instead of '
                           'displaying')
  args = parser.parse_args(argv)

  env = humanoid_CMU.stand()
  converted = parse_amc.convert(args.filename, env.physics,
                                env.control_timestep())
  max_frame = min(args.max_num_frames, converted.qpos.shape[1] - 1)

  w, h = args.width, args.height
  video = np.zeros((max_frame, h, 2 * w, 3), dtype=np.uint8)
  for i in range(max_frame):
    p_i = converted.qpos[:, i]
    # device Data pytrees are immutable; state writes go through the
    # named indexer (reference idiom: physics.data.qpos[:] = p_i)
    with env.physics.reset_context():
      env.physics.named.data.qpos[:] = p_i
    video[i] = np.hstack([
        env.physics.render(h, w, camera_id=0),
        env.physics.render(h, w, camera_id=1)])

  if args.out:
    np.save(args.out, video)
    print(f'wrote {max_frame} frames to {args.out}')
    return video

  import matplotlib.pyplot as plt  # display path (reference behavior)
  import time
  tic = time.time()
  img = None
  for i in range(max_frame):
    if img is None:
      img = plt.imshow(video[i])
    else:
      img.set_data(video[i])
    toc = time.time()
    clock_dt = toc - tic
    tic = time.time()
    plt.pause(max(0.01, 0.03 - clock_dt))
    plt.draw()
  plt.waitforbuttonpress()
  return video


if __name__ == '__main__':
  main()
