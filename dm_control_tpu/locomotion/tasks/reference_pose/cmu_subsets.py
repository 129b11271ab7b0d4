"""Named CMU mocap clip subsets
(reference: dm_control/locomotion/tasks/reference_pose/cmu_subsets.py).

The clip-id lists are benchmark data (they name which CMU database clips
each subset tracks) and match the reference's small subsets exactly.
The large LOCOMOTION_SMALL/ALL subsets (hundreds of ids) are constructed
from the dataset file itself via `collection_from_h5`, which yields the
same collection when pointed at the reference's CMU HDF5 files.
"""

from dm_control_tpu.locomotion.tasks.reference_pose.types import (
    ClipCollection)

GET_UP = ClipCollection(
    ids=('CMU_139_16', 'CMU_139_17', 'CMU_139_18', 'CMU_140_01',
         'CMU_140_02', 'CMU_140_08', 'CMU_140_09'))

# ~2 minutes of walking behaviors.
WALK_TINY = ClipCollection(
    ids=('CMU_016_22', 'CMU_016_23', 'CMU_016_24', 'CMU_016_25',
         'CMU_016_26', 'CMU_016_27', 'CMU_016_28', 'CMU_016_29',
         'CMU_016_30', 'CMU_016_31', 'CMU_016_32', 'CMU_016_33',
         'CMU_016_34', 'CMU_016_47', 'CMU_016_58', 'CMU_047_01',
         'CMU_056_01', 'CMU_069_01', 'CMU_069_02', 'CMU_069_03',
         'CMU_069_04', 'CMU_069_05', 'CMU_069_20', 'CMU_069_21',
         'CMU_069_22', 'CMU_069_23', 'CMU_069_24', 'CMU_069_25',
         'CMU_069_26', 'CMU_069_27', 'CMU_069_28', 'CMU_069_29',
         'CMU_069_30', 'CMU_069_31', 'CMU_069_32', 'CMU_069_33'))

# ~2 minutes of walking/running/jumping behaviors.
RUN_JUMP_TINY = ClipCollection(
    ids=('CMU_009_01', 'CMU_009_02', 'CMU_009_03', 'CMU_009_04',
         'CMU_009_05', 'CMU_009_06', 'CMU_009_07', 'CMU_009_08',
         'CMU_009_09', 'CMU_009_10', 'CMU_009_11', 'CMU_016_22',
         'CMU_016_23', 'CMU_016_24', 'CMU_016_25', 'CMU_016_26',
         'CMU_016_27', 'CMU_016_28', 'CMU_016_29', 'CMU_016_30',
         'CMU_016_31', 'CMU_016_32', 'CMU_016_47', 'CMU_016_48',
         'CMU_016_49', 'CMU_016_50', 'CMU_016_55', 'CMU_016_58',
         'CMU_049_04', 'CMU_049_05', 'CMU_069_01', 'CMU_069_02',
         'CMU_069_03', 'CMU_069_04', 'CMU_069_05', 'CMU_075_01',
         'CMU_075_02', 'CMU_075_03', 'CMU_075_10', 'CMU_075_11',
         'CMU_127_03', 'CMU_127_06', 'CMU_127_07', 'CMU_127_08',
         'CMU_127_09', 'CMU_127_10', 'CMU_127_11', 'CMU_127_12',
         'CMU_128_02', 'CMU_128_03'))


def collection_from_h5(path, prefix=''):
  """Builds a ClipCollection over every clip in an HDF5 dataset file."""
  import h5py
  with h5py.File(path, mode='r') as f:
    ids = tuple(sorted(k for k in f.keys() if k.startswith(prefix)))
  return ClipCollection(ids=ids)


CMU_SUBSETS_DICT = dict(
    get_up=GET_UP,
    walk_tiny=WALK_TINY,
    run_jump_tiny=RUN_JUMP_TINY,
)
