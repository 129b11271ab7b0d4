"""Golden-image parity: TPU ray-caster vs C-oracle (OpenGL) renders.

The goldens in tests/goldens/ were produced by the REFERENCE renderer
(mujoco EGL, tools/gen_goldens.py) — the analogue of the reference's
image-assert infra (dm_control/mujoco/testing/image_utils.py:206-222).
RMS bands: flat-material scenes track the oracle to ~2/255; the
checker scene carries hard texture edges that the oracle multisamples
and the ray-caster point-samples, so its band is wider.
"""

import os
import struct
import sys
import zlib

import numpy as np
import pytest

jax = pytest.importorskip('jax')

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                'tools'))

_GOLDEN_DIR = os.path.join(os.path.dirname(__file__), 'goldens')

# scene name -> RMS band (0-255 scale)
CASES = {
    'grid_sphere': 16.0,
    'materials_box': 6.0,
    'skybox_scene': 6.0,
}


def _scenes():
  path = os.path.join(os.path.dirname(__file__), '..', 'tools',
                      'gen_goldens.py')
  src = open(path).read().split('def main():')[0]
  ns = {'os': os, 'struct': struct, 'zlib': zlib, 'np': np, 'sys': sys,
        '__file__': path}
  exec(src, ns)  # pylint: disable=exec-used
  return ns['SCENES']


def _read_png(path):
  data = open(path, 'rb').read()
  pos, chunks = 8, {}
  while pos < len(data):
    ln = struct.unpack('>I', data[pos:pos + 4])[0]
    tag = data[pos + 4:pos + 8]
    chunks.setdefault(tag, b'')
    chunks[tag] += data[pos + 8:pos + 8 + ln]
    pos += 12 + ln
  w, h, _, _ = struct.unpack('>IIBB', chunks[b'IHDR'][:10])
  raw = zlib.decompress(chunks[b'IDAT'])
  stride = w * 3 + 1
  img = np.zeros((h, w, 3), np.uint8)
  for r in range(h):
    row = raw[r * stride:(r + 1) * stride]
    assert row[0] == 0, 'goldens use filter 0 rows'
    img[r] = np.frombuffer(row[1:], np.uint8).reshape(w, 3)
  return img


@pytest.mark.parametrize('name', sorted(CASES))
def test_golden_rms(name):
  import dm_control_tpu.models as M
  from dm_control_tpu.models import types
  from dm_control_tpu.ops import forward
  from dm_control_tpu.render import rasterizer

  xml = _scenes()[name]
  m = M.from_xml_string(xml)
  d = types.make_data(m)
  d = jax.jit(lambda dd: forward.fwd_position(m, dd))(d)
  img = np.asarray(rasterizer.render(m, d, 240, 320, camera_id=0))
  gold = _read_png(os.path.join(_GOLDEN_DIR, f'{name}.png'))
  rms = float(np.sqrt(np.mean(
      (img.astype(np.float64) - gold.astype(np.float64)) ** 2)))
  assert rms < CASES[name], f'{name}: RMS {rms:.2f} >= {CASES[name]}'
