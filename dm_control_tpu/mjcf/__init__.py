"""Programmatic MJCF scene-description object model (PyMJCF parity).

Public surface follows the reference dm_control.mjcf package
(dm_control/mjcf/__init__.py:18-40).
"""

import os as _os
import zipfile as _zipfile

from dm_control_tpu.mjcf import debugging
from dm_control_tpu.mjcf import skin
from dm_control_tpu.mjcf import traversal_utils
from dm_control_tpu.mjcf.copier import Copier
from dm_control_tpu.mjcf.element import Element, Error, RootElement
from dm_control_tpu.mjcf.element import from_path, from_xml_string
from dm_control_tpu.mjcf.physics import Binding, Physics
from dm_control_tpu.mjcf.traversal_utils import commit_defaults
from dm_control_tpu.mjcf.traversal_utils import get_attachment_frame
from dm_control_tpu.mjcf.traversal_utils import get_frame_freejoint
from dm_control_tpu.mjcf.traversal_utils import get_frame_joints
from dm_control_tpu.mjcf.traversal_utils import get_freejoint

PREFIX_SEPARATOR = '/'


def from_file(file_handle, assets=None):
  """Parses an MJCF model from an open file handle."""
  return from_xml_string(file_handle.read(), assets=assets)


def from_zip(zip_path, model_name=None):
  """Loads an MJCF model (XML + assets) from a .zip archive, the
  inverse of `export_with_assets_as_zip` (reference mjcf/parser.py
  from_zip)."""
  with _zipfile.ZipFile(zip_path) as zf:
    names = zf.namelist()
    xml_names = [n for n in names if n.endswith('.xml')]
    if model_name is not None:
      want = f'{model_name}/{model_name}.xml'
      xml_names = [n for n in xml_names if n == want] or xml_names
    if not xml_names:
      raise ValueError(f'no XML model found in {zip_path!r}')
    xml_name = xml_names[0]
    prefix = _os.path.dirname(xml_name)
    assets = {}
    for n in names:
      if n == xml_name or n.endswith('/'):
        continue
      key = _os.path.relpath(n, prefix) if prefix else n
      assets[key] = zf.read(n)
    xml_string = zf.read(xml_name).decode('utf-8')
  return from_xml_string(xml_string, assets=assets)


def export_with_assets(mjcf_model, out_dir, out_file_name=None):
  """Writes the model XML and its assets to a directory."""
  _os.makedirs(out_dir, exist_ok=True)
  name = out_file_name or f'{mjcf_model.model}.xml'
  with open(_os.path.join(out_dir, name), 'w') as f:
    f.write(mjcf_model.to_xml_string())
  for fname, contents in mjcf_model.get_assets().items():
    mode = 'wb' if isinstance(contents, bytes) else 'w'
    with open(_os.path.join(out_dir, fname), mode) as f:
      f.write(contents)


def export_with_assets_as_zip(mjcf_model, out_dir, model_name=None):
  """Writes `<out_dir>/<name>.zip` containing `<name>/<name>.xml` plus
  every asset (reference mjcf/export_with_assets_as_zip.py:24-70).
  Returns the zip path."""
  name = model_name or mjcf_model.model or 'model'
  _os.makedirs(out_dir, exist_ok=True)
  zip_path = _os.path.join(out_dir, f'{name}.zip')
  with _zipfile.ZipFile(zip_path, 'w') as zf:
    zf.writestr(f'{name}/{name}.xml', mjcf_model.to_xml_string())
    for fname, contents in mjcf_model.get_assets().items():
      zf.writestr(f'{name}/{fname}', contents)
  return zip_path
