"""Generate golden images from the C MuJoCo oracle (EGL headless).

Writes tests/goldens/<name>.png for the scenes in SCENES. Run on a
machine with working EGL (MUJOCO_GL=egl PYOPENGL_PLATFORM=egl is set
below). The golden test (tests/test_render_golden.py) compares the
TPU ray-caster against these at an RMS band.
"""
import os
os.environ.setdefault('MUJOCO_GL', 'egl')
os.environ.setdefault('PYOPENGL_PLATFORM', 'egl')
import struct
import sys
import zlib

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

SCENES = {}

SCENES['grid_sphere'] = """
<mujoco>
  <visual><headlight ambient=".3 .3 .3" diffuse=".6 .6 .6" specular="0 0 0"/>
    <quality shadowsize="0"/></visual>
  <asset>
    <texture name="grid" type="2d" builtin="checker" rgb1=".1 .2 .3"
             rgb2=".2 .3 .4" width="300" height="300"/>
    <material name="grid" texture="grid" texrepeat="1 1"
              texuniform="true" reflectance="0"/>
  </asset>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 .1" material="grid"/>
    <body pos="0 0 0.5">
      <geom name="ball" type="sphere" size="0.3" rgba="0.8 0.2 0.2 1"/>
    </body>
    <camera name="fixed" pos="0 -2.5 1.2" xyaxes="1 0 0 0 0.42 0.91"/>
  </worldbody>
</mujoco>
"""

SCENES['materials_box'] = """
<mujoco>
  <visual><headlight ambient=".3 .3 .3" diffuse=".6 .6 .6" specular="0 0 0"/>
    <quality shadowsize="0"/></visual>
  <asset>
    <material name="blue" rgba=".2 .3 .8 1" specular="0" shininess="0"/>
    <material name="green" rgba=".2 .7 .3 1" specular="0" shininess="0"/>
  </asset>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 .1" rgba=".45 .45 .5 1"/>
    <body pos="-0.5 0 0.3">
      <geom name="box1" type="box" size=".25 .25 .3" material="blue"/>
    </body>
    <body pos="0.6 0.2 0.25">
      <geom name="cap" type="capsule" size=".15 .2" material="green"/>
    </body>
    <camera name="fixed" pos="0 -2.8 1.5" xyaxes="1 0 0 0 0.47 0.88"/>
  </worldbody>
</mujoco>
"""

SCENES['skybox_scene'] = """
<mujoco>
  <visual><headlight ambient=".3 .3 .3" diffuse=".6 .6 .6" specular="0 0 0"/>
    <quality shadowsize="0"/></visual>
  <asset>
    <texture name="skybox" type="skybox" builtin="gradient"
             rgb1=".4 .6 .8" rgb2="0 0 0" width="100" height="100"/>
  </asset>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 .1" rgba=".5 .5 .55 1"/>
    <body pos="0 0 0.4">
      <geom name="ell" type="ellipsoid" size=".35 .2 .25"
            rgba=".8 .7 .2 1"/>
    </body>
    <camera name="fixed" pos="0 -2.5 0.9" xyaxes="1 0 0 0 0.2 0.98"/>
  </worldbody>
</mujoco>
"""


def write_png(path, img):
  h, w, _ = img.shape
  raw = b''.join(b'\x00' + img[r].tobytes() for r in range(h))
  def chunk(tag, data):
    c = struct.pack('>I', len(data)) + tag + data
    return c + struct.pack('>I', zlib.crc32(tag + data) & 0xffffffff)
  png = (b'\x89PNG\r\n\x1a\n' +
         chunk(b'IHDR', struct.pack('>IIBBBBB', w, h, 8, 2, 0, 0, 0)) +
         chunk(b'IDAT', zlib.compress(raw, 9)) + chunk(b'IEND', b''))
  open(path, 'wb').write(png)


def main():
  import mujoco
  out_dir = os.path.join(os.path.dirname(__file__), '..', 'tests',
                         'goldens')
  os.makedirs(out_dir, exist_ok=True)
  for name, xml in SCENES.items():
    mj = mujoco.MjModel.from_xml_string(xml)
    md = mujoco.MjData(mj)
    mujoco.mj_forward(mj, md)
    r = mujoco.Renderer(mj, 240, 320)
    r.update_scene(md, camera='fixed')
    img = r.render()
    write_png(os.path.join(out_dir, f'{name}.png'), img)
    print(name, 'mean', img.mean())


if __name__ == '__main__':
  main()
