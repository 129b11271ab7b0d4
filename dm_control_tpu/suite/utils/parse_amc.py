"""CMU .amc motion-capture → humanoid_CMU qpos/qvel trajectories.

Behavioural counterpart of reference
dm_control/suite/utils/parse_amc.py:46-190: parse the frame-numbered
AMC text format, map the 62 CMU channels onto the humanoid_CMU joint
ordering, convert the root to metres + a wxyz quaternion (with the
AMC→MuJoCo 90° x-rotation frame change), cubic-spline-resample to the
requested timestep, and finite-difference qvel (quaternion-aware for
the root).
"""

from __future__ import annotations

import collections

import numpy as np
from scipy import interpolate

from dm_control_tpu.mujoco import math as mjmath

MOCAP_DT = 1.0 / 120.0
# CMU skeleton length unit: 1/0.45 inches per unit → metres.
CONVERSION_LENGTH = 0.056444

_CMU_MOCAP_JOINT_ORDER = (
    'root0', 'root1', 'root2', 'root3', 'root4', 'root5', 'lowerbackrx',
    'lowerbackry', 'lowerbackrz', 'upperbackrx', 'upperbackry',
    'upperbackrz', 'thoraxrx', 'thoraxry', 'thoraxrz', 'lowerneckrx',
    'lowerneckry', 'lowerneckrz', 'upperneckrx', 'upperneckry',
    'upperneckrz', 'headrx', 'headry', 'headrz', 'rclaviclery',
    'rclaviclerz', 'rhumerusrx', 'rhumerusry', 'rhumerusrz', 'rradiusrx',
    'rwristry', 'rhandrx', 'rhandrz', 'rfingersrx', 'rthumbrx',
    'rthumbrz', 'lclaviclery', 'lclaviclerz', 'lhumerusrx', 'lhumerusry',
    'lhumerusrz', 'lradiusrx', 'lwristry', 'lhandrx', 'lhandrz',
    'lfingersrx', 'lthumbrx', 'lthumbrz', 'rfemurrx', 'rfemurry',
    'rfemurrz', 'rtibiarx', 'rfootrx', 'rfootrz', 'rtoesrx', 'lfemurrx',
    'lfemurry', 'lfemurrz', 'ltibiarx', 'lfootrx', 'lfootrz', 'ltoesrx')

Converted = collections.namedtuple('Converted', ['qpos', 'qvel', 'time'])


def parse(file_name):
  """Reads an .amc file into a list of per-frame channel arrays."""
  frames = []
  current = None
  with open(file_name, 'r') as f:
    for raw in f:
      line = raw.strip()
      if not line or line.startswith((':', '#')):
        continue
      if line.isdigit():
        if current is not None:
          frames.append(np.array(current, dtype=float))
        current = []
      elif current is not None:
        current.extend(float(tok) for tok in line.split()[1:])
  if current:
    frames.append(np.array(current, dtype=float))
  return frames


class Amcvals2qpos:
  """Maps one AMC frame's channel vector onto a model's qpos layout."""

  def __init__(self, index2joint, joint_order=_CMU_MOCAP_JOINT_ORDER):
    nq = len(index2joint)
    # Root position: AMC (x, y, z) in skeleton units, y-up →
    # MuJoCo metres, z-up.
    self._root_xyz_transform = CONVERSION_LENGTH * np.array(
        [[1., 0., 0.], [0., 0., -1.], [0., 1., 0.]])
    # Every named rotational channel maps 1:1 (degrees → radians).
    transform = np.zeros((nq, len(joint_order)))
    for qi in range(nq):
      joint = index2joint[qi]
      if joint in joint_order and joint.endswith(('rx', 'ry', 'rz')):
        transform[qi, joint_order.index(joint)] = 1.0
    self._amc2qpos = transform

  def __call__(self, amc_val):
    qpos = self._amc2qpos @ np.deg2rad(amc_val)
    qpos[0:3] = self._root_xyz_transform @ amc_val[0:3]
    root_quat = mjmath.euler2quat(amc_val[3], amc_val[4], amc_val[5])
    # frame change: AMC skeleton is y-up; rotate 90° about x.
    qpos[3:7] = mjmath.mj_quatprod(
        mjmath.euler2quat(90, 0, 0), root_quat)
    return qpos


def convert(file_name, physics, timestep):
  """Parses `file_name` and resamples it onto `physics`'s qpos layout.

  Returns a Converted(qpos [nq, T], qvel [nv, T-1], time [T]) tuple
  with frames `timestep` seconds apart.
  """
  frames = parse(file_name)

  axis = physics.named.data.qpos.axes
  index2joint = {}
  for name in axis.names:
    rows = axis.convert(name)
    if isinstance(rows, slice):
      indices = range(rows.start, rows.stop)
    else:
      indices = [int(rows)]
    for qi in indices:
      index2joint[qi] = name

  to_qpos = Amcvals2qpos(index2joint)
  qpos_frames = np.stack([to_qpos(f) for f in frames])  # [T_amc, nq]

  time_vals = np.arange(0, len(frames) * MOCAP_DT - 1e-8, MOCAP_DT)
  time_new = np.arange(0, len(frames) * MOCAP_DT, timestep)
  while time_new[-1] > time_vals[-1]:
    time_new = time_new[:-1]

  resampled = np.stack([
      interpolate.splev(time_new,
                        interpolate.splrep(time_vals, qpos_frames[:, i]))
      for i in range(qpos_frames.shape[1])])  # [nq, T]

  qvels = []
  for t in range(resampled.shape[1] - 1):
    p_t, p_tp1 = resampled[:, t], resampled[:, t + 1]
    qvels.append(np.concatenate([
        (p_tp1[:3] - p_t[:3]) / timestep,
        mjmath.mj_quat2vel(mjmath.mj_quatdiff(p_t[3:7], p_tp1[3:7]),
                           timestep),
        (p_tp1[7:] - p_t[7:]) / timestep]))
  qvel_resampled = np.vstack(qvels).T  # [nv, T-1]

  return Converted(resampled, qvel_resampled, time_new)
