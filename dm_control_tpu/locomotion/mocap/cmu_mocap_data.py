"""Paths to the CMU mocap HDF5 datasets.

The reference downloads ~1GB HDF5 conversions of the CMU mocap database
on first use (reference: dm_control/locomotion/mocap/cmu_mocap_data.py:
30-114).  This build has zero network egress, so the data must be
provided locally: set `DM_CONTROL_TPU_MOCAP_DIR` (or pass an explicit
path) to a directory containing the same files the reference fetches:

  cmu_2019.h5 / cmu_2019_08-01-2021.h5 / cmu_2020_dfe3e9e0.h5
"""

import os

H5_FILENAMES = {
    ('2019', False): 'cmu_2019.h5',
    ('2019', True): 'cmu_2019_08-01-2021.h5',
    ('2020', False): 'cmu_2020_dfe3e9e0.h5',
    ('2020', True): 'cmu_2020_dfe3e9e0.h5',
}

_ENV_VAR = 'DM_CONTROL_TPU_MOCAP_DIR'


def _data_dir():
  path = os.environ.get(_ENV_VAR)
  if not path:
    path = os.path.join(os.path.expanduser('~'), '.dm_control_tpu', 'mocap')
  return path


def get_path_for_cmu(version='2019', environment_features=False):
  """Returns the local path of the requested CMU mocap HDF5 file.

  Raises a FileNotFoundError with setup instructions when the file has
  not been provided (this framework performs no downloads).
  """
  try:
    filename = H5_FILENAMES[(str(version), bool(environment_features))]
  except KeyError:
    raise ValueError('Unknown CMU mocap dataset version: {!r}'
                     .format(version)) from None
  path = os.path.join(_data_dir(), filename)
  if not os.path.exists(path):
    raise FileNotFoundError(
        'CMU mocap data file {!r} not found. Download it with the upstream '
        'dm_control tooling and place it under {} (or set ${}).'
        .format(filename, _data_dir(), _ENV_VAR))
  return path
