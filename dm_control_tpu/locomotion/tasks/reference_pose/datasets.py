"""Named datasets for reference-pose tasks
(reference: dm_control/locomotion/tasks/reference_pose/datasets.py)."""

from dm_control_tpu.locomotion.tasks.reference_pose import cmu_subsets

DATASETS = dict()
DATASETS.update(cmu_subsets.CMU_SUBSETS_DICT)
