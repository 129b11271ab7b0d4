"""Round-3 API additions: variation modules, parse_amc, camera
classes, xml_tools, composer discount semantics."""

import numpy as np
import pytest

from dm_control_tpu.composer.variation import (colors, deterministic,
                                               distributions, math as
                                               vmath, rotations)
from dm_control_tpu.composer.variation import variation_broadcaster
from dm_control_tpu.mujoco import math as mjmath
from dm_control_tpu.suite.utils import parse_amc
from dm_control_tpu.utils import xml_tools


def test_uniform_quaternion_is_unit():
  rs = np.random.RandomState(0)
  q = rotations.UniformQuaternion()(random_state=rs)
  assert q.shape == (4,)
  np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-12)


def test_quaternion_from_axis_angle():
  q = rotations.QuaternionFromAxisAngle(
      axis=[0.0, 0.0, 1.0], angle=np.pi / 2)(random_state=np.random)
  np.testing.assert_allclose(
      q, [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)], atol=1e-12)


def test_quaternion_premultiply_cumulative():
  rot90 = np.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
  v = rotations.QuaternionPreMultiply(
      deterministic.Constant(rot90), cumulative=True)
  q = rotations.IDENTITY_QUATERNION
  for _ in range(2):
    q = v(initial_value=rotations.IDENTITY_QUATERNION, current_value=q,
          random_state=np.random)
  # two 90° yaws = 180° yaw
  np.testing.assert_allclose(np.abs(q), [0, 0, 0, 1], atol=1e-12)


def test_hsv_and_gray_variations():
  rgba = colors.HsvVariation(h=0.0, s=0.0, v=0.5)(
      random_state=np.random)
  np.testing.assert_allclose(rgba, [0.5, 0.5, 0.5, 1.0])
  gray = colors.GrayVariation(0.25, alpha=0.5)(random_state=np.random)
  np.testing.assert_allclose(gray, [0.25, 0.25, 0.25, 0.5])


def test_deterministic_sequence_cycles():
  seq = deterministic.Sequence([1, 2, 3])
  got = [seq() for _ in range(5)]
  assert got == [1, 2, 3, 1, 2]


def test_math_ops_traverse_variations():
  op = vmath.Norm(deterministic.Constant(np.array([3.0, 4.0])))
  assert op() == 5.0
  assert vmath.Max([1.0, deterministic.Constant(7.0)])() == 7.0


def test_broadcaster_shares_samples():
  bc = variation_broadcaster.VariationBroadcaster(
      distributions.Uniform(0.0, 1.0))
  p1, p2 = bc.get_proxy(), bc.get_proxy()
  rs = np.random.RandomState(3)
  a1, b1 = p1(random_state=rs), p2(random_state=rs)
  a2, b2 = p1(random_state=rs), p2(random_state=rs)
  assert a1 == b1 and a2 == b2 and a1 != a2


def test_euler2quat_matches_known():
  # 90° roll about x
  q = mjmath.euler2quat(90, 0, 0)
  np.testing.assert_allclose(
      q, [np.cos(np.pi / 4), np.sin(np.pi / 4), 0, 0], atol=1e-12)
  # quat2vel round trip
  vel = mjmath.mj_quat2vel(q, 1.0)
  np.testing.assert_allclose(vel, [np.pi / 2, 0, 0], atol=1e-12)


def test_quatdiff_inverse_relation():
  q1 = mjmath.euler2quat(10, 20, 30)
  q2 = mjmath.euler2quat(40, -10, 5)
  d = mjmath.mj_quatdiff(q1, q2)
  np.testing.assert_allclose(mjmath.mj_quatprod(q1, d), q2, atol=1e-12)


def test_parse_amc_format(tmp_path):
  amc = tmp_path / 'clip.amc'
  amc.write_text('\n'.join([
      '#!OML:ASF foo.asf', ':FULLY-SPECIFIED', ':DEGREES',
      '1', 'root 1 2 3 10 20 30', 'lowerback 1 2 3',
      '2', 'root 4 5 6 40 50 60', 'lowerback 4 5 6', '']))
  frames = parse_amc.parse(str(amc))
  assert len(frames) == 2
  np.testing.assert_allclose(frames[0], [1, 2, 3, 10, 20, 30, 1, 2, 3])
  np.testing.assert_allclose(frames[1], [4, 5, 6, 40, 50, 60, 4, 5, 6])


def test_amcvals2qpos_root_conversion():
  # Minimal skeleton: free root (7 qpos) + one named joint.
  index2joint = {i: 'root' for i in range(7)}
  index2joint[7] = 'lowerbackrx'
  to_qpos = parse_amc.Amcvals2qpos(index2joint)
  # AMC channel vector: root xyz + euler + 56 zeros, lowerbackrx=90deg
  amc = np.zeros(62)
  amc[0:3] = [1.0, 2.0, 3.0]
  amc[6] = 90.0  # lowerbackrx slot in _CMU_MOCAP_JOINT_ORDER
  qpos = to_qpos(amc)
  # y-up -> z-up: (x, y, z) -> (x, -z, y) scaled
  np.testing.assert_allclose(
      qpos[0:3],
      np.array([1.0, -3.0, 2.0]) * parse_amc.CONVERSION_LENGTH)
  np.testing.assert_allclose(np.linalg.norm(qpos[3:7]), 1.0)
  np.testing.assert_allclose(qpos[7], np.pi / 2)


def test_xml_tools_find_and_nest():
  tree = xml_tools.parse(
      '<mujoco><worldbody><geom name="a"/><body><geom name="b"/>'
      '</body></worldbody></mujoco>')
  root = tree.getroot()
  assert xml_tools.find_element(root, 'geom', 'b').get('name') == 'b'
  with pytest.raises(ValueError):
    xml_tools.find_element(root, 'geom', 'zzz')
  import xml.etree.ElementTree as ET
  nested = xml_tools.nested_element(ET.Element('body'), depth=2)
  assert nested.find('body').find('body') is not None


def test_camera_matrix_projects_world_points():
  """A geom's world position should project into its pixel footprint."""
  from dm_control_tpu import mujoco as mj
  physics = mj.Physics.from_xml_string("""
  <mujoco>
    <worldbody>
      <camera name="fixed" pos="0 -2 0.5" quat="0.7071 0.7071 0 0"/>
      <body pos="0 0 0.5"><geom name="ball" type="sphere" size="0.2"
        rgba="1 0 0 1"/></body>
    </worldbody>
  </mujoco>""")
  cam = mj.Camera(physics, height=64, width=64, camera_id=0)
  xyz1 = np.append(np.asarray(physics.data.geom_xpos[0]), 1.0)
  xs, ys, s = cam.matrix @ xyz1
  u, v = xs / s, ys / s
  assert 0 <= u < 64 and 0 <= v < 64
  # the rendered segmentation should agree the ball covers that pixel
  seg = cam.render(segmentation=True)
  assert seg[int(round(v)), int(round(u)), 0] == 0  # geom id 0


def test_movable_camera_pose_roundtrip():
  from dm_control_tpu import mujoco as mj
  physics = mj.Physics.from_xml_string(
      '<mujoco><worldbody><geom type="sphere" size="0.1"/>'
      '</worldbody></mujoco>')
  cam = mj.MovableCamera(physics, height=16, width=16)
  cam.set_pose([0.0, 0.0, 0.0], 2.0, 45.0, -30.0)
  pose = cam.get_pose()
  assert pose.distance == 2.0 and pose.azimuth == 45.0
  rgb = cam.render()
  assert rgb.shape == (16, 16, 3)


def test_render_rejects_unsupported_options():
  from dm_control_tpu import mujoco as mj
  physics = mj.Physics.from_xml_string(
      '<mujoco><worldbody><geom type="sphere" size="0.1"/>'
      '</worldbody></mujoco>')
  with pytest.raises(NotImplementedError):
    physics.render(overlays=[mj.TextOverlay(title='t', body='b')])
  with pytest.raises(NotImplementedError):
    physics.render(scene_option=object())
  with pytest.raises(ValueError):
    physics.render(depth=True, segmentation=True)


def test_composer_mid_step_discount(cartpole_like_task=None):
  """MID steps must carry task.get_discount(), not hardcoded 1.0
  (reference composer/environment.py:443-456)."""
  from dm_control_tpu import composer

  class _DiscountTask(composer.NullTask):

    def get_discount(self, physics):
      return 0.75

  from dm_control_tpu import mjcf
  root = mjcf.RootElement()
  root.worldbody.add('geom', type='sphere', size=[0.1])
  arena = composer.ModelWrapperEntity(root)
  task = _DiscountTask(arena)
  env = composer.Environment(task)
  env.reset()
  ts = env.step([])
  assert ts.mid()
  assert ts.discount == 0.75
