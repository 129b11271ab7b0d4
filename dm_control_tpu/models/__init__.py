"""Model compilation public API."""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax.numpy as jnp

from dm_control_tpu.models import builder
from dm_control_tpu.models import calibrate as calibrate_lib
from dm_control_tpu.models import compiler
from dm_control_tpu.models import constants
from dm_control_tpu.models.types import Contact, Data, Model, Option
from dm_control_tpu.models.types import make_data

GeomType = constants.GeomType
JointType = constants.JointType
DisableBit = constants.DisableBit


def from_xml_string(xml_string: str,
                    assets: Optional[Dict] = None,
                    base_dir: Optional[str] = None,
                    dtype=jnp.float32,
                    contact_budget: Optional[int] = None) -> Model:
  """Compile an MJCF string to a device-resident Model.

  contact_budget: per-condim-group cap on simultaneously active contact
  slots for large scenes (runtime top-K compaction). The default (16)
  is tuned for the benchmark suite; composer scenes with permanently
  interpenetrating robot meshes (e.g. the Jaco arm) need a larger
  envelope so prop contacts are never starved out of the budget.
  """
  c = compiler.Compiler(xml_string, assets=assets, base_dir=base_dir)
  c.parse()
  m = builder.build(c, dtype=dtype, contact_budget=contact_budget)
  m = calibrate_lib.calibrate(m)
  return m


def from_xml_path(path: str, assets: Optional[Dict] = None,
                  dtype=jnp.float32,
                  contact_budget: Optional[int] = None) -> Model:
  with open(path, 'r') as f:
    xml = f.read()
  return from_xml_string(xml, assets=assets,
                         base_dir=os.path.dirname(os.path.abspath(path)),
                         dtype=dtype, contact_budget=contact_budget)
