"""Programmatic MJCF scene-description object model (PyMJCF parity).

Public surface follows the reference dm_control.mjcf package
(dm_control/mjcf/__init__.py:18-40); bind()/Physics integration lands
with the composer stack.
"""

from dm_control_tpu.mjcf.element import Element, Error, RootElement
from dm_control_tpu.mjcf.element import from_path, from_xml_string
from dm_control_tpu.mjcf.physics import Binding, Physics


def get_attachment_frame(mjcf_model):
  """The frame body an attached model is mounted on, or None
  (reference mjcf/__init__.py get_attachment_frame)."""
  parent = getattr(mjcf_model, '_parent_root', None)
  if parent is None:
    return None
  for frame, sub, _ in parent._attachments:
    if sub is mjcf_model:
      return frame
  return None


def export_with_assets(mjcf_model, out_dir, out_file_name=None):
  """Writes the model XML and its assets to a directory."""
  import os
  os.makedirs(out_dir, exist_ok=True)
  name = out_file_name or f'{mjcf_model.model}.xml'
  with open(os.path.join(out_dir, name), 'w') as f:
    f.write(mjcf_model.to_xml_string())
  for fname, contents in mjcf_model.get_assets().items():
    mode = 'wb' if isinstance(contents, bytes) else 'w'
    with open(os.path.join(out_dir, fname), mode) as f:
      f.write(contents)
