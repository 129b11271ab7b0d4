# Spec constants in this file reproduce task-specification values from
# dm_control (github.com/google-deepmind/dm_control), Copyright The
# dm_control Authors, Apache License 2.0.
"""MuJoCo binary skin (.skn) file codec.

The on-disk layout is fixed by the MuJoCo XML reference (skin assets):
  int32 counts [nvertex, ntexcoord, nface, nbone], then f4 vertex xyz,
  f4 texcoord uv, i4 face triples, and per bone: a 40-byte
  NUL-padded body name, f4[3] bindpos, f4[4] bindquat, int32 count,
  i4 vertex ids, f4 vertex weights — all little-endian.
(Behavioural counterpart of reference dm_control/mjcf/skin.py:35-98.)
"""

import collections
import io
import struct

import numpy as np

MAX_BODY_NAME_LENGTH = 40

Skin = collections.namedtuple(
    'Skin', ('vertices', 'texcoords', 'faces', 'bones'))

Bone = collections.namedtuple(
    'Bone', ('body', 'bindpos', 'bindquat', 'vertex_ids', 'vertex_weights'))


def parse(contents, body_getter):
  """Decodes skin file bytes; bone bodies resolve lazily via
  `body_getter(name)` so parsing works before model attachment."""
  f = io.BytesIO(contents)
  nvertex, ntexcoord, nface, nbone = struct.unpack('<iiii', f.read(16))
  vertices = np.frombuffer(
      f.read(12 * nvertex), dtype='<f4').reshape(-1, 3)
  texcoords = np.frombuffer(
      f.read(8 * ntexcoord), dtype='<f4').reshape(-1, 2)
  faces = np.frombuffer(f.read(12 * nface), dtype='<i4').reshape(-1, 3)
  bones = []
  for _ in range(nbone):
    raw_name = f.read(MAX_BODY_NAME_LENGTH).decode().split('\0')[0]
    bindpos = np.asarray(struct.unpack('<fff', f.read(12)), dtype=float)
    bindquat = np.asarray(struct.unpack('<ffff', f.read(16)), dtype=float)
    count, = struct.unpack('<i', f.read(4))
    vertex_ids = np.frombuffer(f.read(4 * count), dtype='<i4')
    vertex_weights = np.frombuffer(f.read(4 * count), dtype='<f4')
    bones.append(Bone(
        body=(lambda name=raw_name: body_getter(name)),
        bindpos=bindpos, bindquat=bindquat,
        vertex_ids=vertex_ids, vertex_weights=vertex_weights))
  return Skin(vertices=vertices, texcoords=texcoords, faces=faces,
              bones=bones)


def serialize(skin):
  """Encodes a `Skin` back into skin-file bytes (parse's inverse)."""
  out = io.BytesIO()
  out.write(struct.pack('<iiii', len(skin.vertices), len(skin.texcoords),
                        len(skin.faces), len(skin.bones)))
  out.write(np.asarray(skin.vertices).astype('<f4').tobytes())
  out.write(np.asarray(skin.texcoords).astype('<f4').tobytes())
  out.write(np.asarray(skin.faces).astype('<i4').tobytes())
  for bone in skin.bones:
    body = bone.body()
    name = getattr(body, 'full_identifier', None) or str(body)
    body_bytes = name.encode('utf-8')
    if len(body_bytes) > MAX_BODY_NAME_LENGTH:
      raise ValueError(
          'body name exceeds the 40-byte skin-format limit: '
          '{!r}'.format(name))
    out.write(body_bytes.ljust(MAX_BODY_NAME_LENGTH, b'\0'))
    out.write(np.asarray(bone.bindpos).astype('<f4').tobytes())
    out.write(np.asarray(bone.bindquat).astype('<f4').tobytes())
    if len(bone.vertex_ids) != len(bone.vertex_weights):
      raise ValueError('vertex_ids and vertex_weights length mismatch')
    out.write(struct.pack('<i', len(bone.vertex_ids)))
    out.write(np.asarray(bone.vertex_ids).astype('<i4').tobytes())
    out.write(np.asarray(bone.vertex_weights).astype('<f4').tobytes())
  return out.getvalue()
