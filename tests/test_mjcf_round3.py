"""Round-3 PyMJCF additions: skin codec, copier, traversal utils,
zip export/import, debugging."""

import numpy as np
import pytest

from dm_control_tpu import mjcf
from dm_control_tpu.mjcf import debugging
from dm_control_tpu.mjcf import skin as skin_lib


def _simple_model(name='m'):
  root = mjcf.RootElement(model=name)
  body = root.worldbody.add('body', name='torso', pos=[0, 0, 1])
  body.add('freejoint')
  body.add('geom', name='ball', type='sphere', size=[0.1])
  return root, body


def test_skin_roundtrip():
  root, body = _simple_model()
  bone = skin_lib.Bone(
      body=lambda: body,
      bindpos=np.zeros(3), bindquat=np.array([1., 0, 0, 0]),
      vertex_ids=np.arange(3, dtype=np.int32),
      vertex_weights=np.ones(3, dtype=np.float32))
  skin = skin_lib.Skin(
      vertices=np.arange(9, dtype=np.float32).reshape(3, 3),
      texcoords=np.zeros((3, 2), dtype=np.float32),
      faces=np.array([[0, 1, 2]], dtype=np.int32),
      bones=[bone])
  blob = skin_lib.serialize(skin)
  parsed = skin_lib.parse(blob, body_getter=lambda name: body)
  np.testing.assert_array_equal(parsed.vertices, skin.vertices)
  np.testing.assert_array_equal(parsed.faces, skin.faces)
  assert len(parsed.bones) == 1
  np.testing.assert_array_equal(parsed.bones[0].vertex_ids, [0, 1, 2])
  assert parsed.bones[0].body() is body


def test_traversal_utils():
  root, body = _simple_model()
  assert mjcf.get_freejoint(body) is not None
  parent = mjcf.RootElement(model='arena')
  frame = parent.attach(root)
  assert mjcf.get_attachment_frame(root) is frame
  frame.add('freejoint')
  assert mjcf.get_frame_freejoint(root) is not None
  assert len(mjcf.get_frame_joints(root)) == 1


def test_copier():
  src, _ = _simple_model('src')
  dst = mjcf.RootElement(model='dst')
  mjcf.Copier(src.worldbody).copy_into(dst.worldbody)
  copied = dst.find('body', 'torso')
  assert copied is not None
  assert copied.find is not None
  assert dst.find('geom', 'ball') is not None


def test_zip_roundtrip(tmp_path):
  root, _ = _simple_model('zipper')
  zip_path = mjcf.export_with_assets_as_zip(root, str(tmp_path))
  loaded = mjcf.from_zip(zip_path)
  assert loaded.find('body', 'torso') is not None
  # loaded model compiles
  physics = mjcf.Physics.from_mjcf_model(loaded)
  assert physics.model.nq == 7


def test_debugging_records_stacks():
  debugging.enable_debug_mode()
  try:
    root, body = _simple_model()
    stack = debugging.element_creation_stack(body)
    assert stack, 'creation stack should be recorded in debug mode'
    assert any('test_mjcf_round3' in f.filename for f in stack)
    ctx = debugging.DebugContext()
    ctx.commit_xml_string(root.to_xml_string(), root=root)
    try:
      raise ValueError('Error on line 3 of XML')
    except ValueError:
      with pytest.raises(ValueError, match='XML line 3'):
        ctx.process_and_raise_last_exception()
  finally:
    debugging.disable_debug_mode()


def test_commit_defaults():
  root = mjcf.RootElement(model='d')
  top = root.default
  top.add('geom', rgba=[1, 0, 0, 1])
  body = root.worldbody.add('body', name='b')
  geom = body.add('geom', type='sphere', size=[0.1])
  mjcf.commit_defaults(geom)
  np.testing.assert_allclose(
      np.asarray(geom.get_attributes()['rgba'], dtype=float),
      [1, 0, 0, 1])
