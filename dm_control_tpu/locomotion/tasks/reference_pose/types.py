"""Clip-collection spec for reference-pose tasks.

Behavioral contract: reference locomotion/tasks/reference_pose/types.py
— a validated bundle of clip ids with optional per-clip start/end steps
and sampling weights.
"""

import dataclasses
from typing import Optional, Sequence, Union

import numpy as np


@dataclasses.dataclass
class ClipCollection:
  """Mocap clip ids plus optional per-clip windows and weights.

  `start_steps` defaults to zeros; `end_steps` stays None until the
  task fills it from the loaded clip lengths; `weights` defaults to
  uniform and must be non-negative.
  """

  ids: Sequence[str]
  start_steps: Optional[Sequence[int]] = None
  end_steps: Optional[Sequence[int]] = None
  weights: Optional[Sequence[Union[int, float]]] = None

  def __post_init__(self):
    n = len(self.ids)
    if self.start_steps is None:
      self.start_steps = (0,) * n
    for field in ('start_steps', 'end_steps', 'weights'):
      value = getattr(self, field)
      if value is not None and len(value) != n:
        raise ValueError(
            f'ClipCollection validation failed. {field} has '
            f'{len(value)} entries for {n} clips')
    if self.weights is None:
      self.weights = (1.0,) * n
    elif np.any(np.asarray(self.weights) < 0.):
      raise ValueError(
          'ClipCollection validation failed. negative weight')
