"""Checkpoint / resume for simulation state.

The physics state is the Data pytree (qpos, qvel, act, time + mocap);
(reference contract: dm_control/mujoco/engine.py:235-285 get_state/
set_state and pickling via data). Batched states save/restore the same
way — leading batch dims are preserved.
"""

from __future__ import annotations

import io
from typing import Optional

import jax
import numpy as np

from dm_control_tpu.models import types

# fields that fully determine the simulation state
STATE_FIELDS = ('time', 'qpos', 'qvel', 'act', 'ctrl',
                'qacc_warmstart', 'qfrc_applied', 'xfrc_applied',
                'mocap_pos', 'mocap_quat')


def state_dict(data: types.Data) -> dict:
  host = jax.device_get({f: getattr(data, f) for f in STATE_FIELDS})
  return {k: np.asarray(v) for k, v in host.items()}


def save_state(path: str, data: types.Data) -> None:
  np.savez_compressed(path, **state_dict(data))


def load_state(path: str, data: types.Data) -> types.Data:
  """Returns `data` with the saved state fields restored."""
  with np.load(path) as blob:
    updates = {k: blob[k] for k in blob.files}
  return restore_state(data, updates)


def restore_state(data: types.Data, state: dict) -> types.Data:
  for f in STATE_FIELDS:
    if f not in state:
      raise ValueError(f'missing state field {f!r}')
    if np.shape(state[f]) != tuple(np.shape(getattr(data, f))):
      raise ValueError(
          f'state field {f!r} has shape {np.shape(state[f])}, '
          f'expected {tuple(np.shape(getattr(data, f)))}')
  return data.replace(**{f: state[f] for f in STATE_FIELDS})


def serialize(data: types.Data) -> bytes:
  buf = io.BytesIO()
  np.savez_compressed(buf, **state_dict(data))
  return buf.getvalue()


def deserialize(blob: bytes, data: types.Data) -> types.Data:
  with np.load(io.BytesIO(blob)) as loaded:
    updates = {k: loaded[k] for k in loaded.files}
  return restore_state(data, updates)
