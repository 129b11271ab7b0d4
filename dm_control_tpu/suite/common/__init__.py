"""Suite model assets (reference: dm_control/suite/common/__init__.py).

The MJCF files under ../assets are verbatim copies of the reference
task-definition data (see ../assets/README.md for attribution); this
module is the loader the domain modules share.
"""

import os

from dm_control_tpu import models

ASSETS_DIR = os.path.normpath(
    os.path.join(os.path.dirname(__file__), '..', 'assets'))

# Include-resolvable asset mapping for both this compiler and the C
# oracle (mujoco.MjModel.from_xml_string(xml, ASSETS) in bench/tests).
ASSETS = {}
for _name in os.listdir(os.path.join(ASSETS_DIR, 'common')):
  with open(os.path.join(ASSETS_DIR, 'common', _name), 'rb') as _f:
    _data = _f.read()
  ASSETS[f'./common/{_name}'] = _data
  ASSETS[f'common/{_name}'] = _data


def read_model(model_filename: str) -> str:
  """Returns the MJCF source for one suite model."""
  with open(os.path.join(ASSETS_DIR, model_filename)) as f:
    return f.read()


def load_model(model_filename_or_xml: str, dtype=None, **kwargs):
  """Compile a suite model (filename under assets/, or raw XML)."""
  xml = (read_model(model_filename_or_xml)
         if model_filename_or_xml.endswith('.xml')
         and '<' not in model_filename_or_xml
         else model_filename_or_xml)
  if dtype is not None:
    kwargs['dtype'] = dtype
  return models.from_xml_string(xml, base_dir=ASSETS_DIR, **kwargs)
