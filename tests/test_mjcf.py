"""Tests for the MJCF object model (element tree, attach, round-trip)."""

import numpy as np
import pytest

from dm_control_tpu import mjcf


def test_build_and_serialize():
  root = mjcf.RootElement(model='test')
  root.option.timestep = 0.004
  body = root.worldbody.add('body', name='torso', pos=[0, 0, 1])
  body.add('joint', name='pin', type='hinge', axis=[0, 1, 0])
  body.add('geom', name='ball', type='sphere', size=[0.1], mass=1.0)
  root.actuator.add('motor', name='drive', joint='pin', gear=[2])
  xml = root.to_xml_string()
  assert '<body name="torso"' in xml
  assert 'joint="pin"' in xml
  # compiles through the model pipeline
  import dm_control_tpu.models as M
  m = M.from_xml_string(xml)
  assert m.nv == 1 and m.nu == 1


def test_find_and_namescope():
  root = mjcf.RootElement(model='t')
  b = root.worldbody.add('body', name='b1')
  g = b.add('geom', name='g1', size=[0.1])
  assert root.find('body', 'b1') is b
  assert root.find('geom', 'g1') is g
  assert root.find('geom', 'nope') is None
  assert g in root.find_all('geom')
  with pytest.raises(mjcf.Error):
    b.add('geom', name='g1', size=[0.2])  # duplicate name


def test_attribute_validation():
  root = mjcf.RootElement()
  body = root.worldbody.add('body', name='x')
  with pytest.raises(mjcf.Error):
    body.add('geom', no_such_attr=3)
  with pytest.raises(mjcf.Error):
    root.worldbody.add('actuator')  # wrong place


def test_remove():
  root = mjcf.RootElement()
  b = root.worldbody.add('body', name='gone')
  b.remove()
  assert root.find('body', 'gone') is None
  assert b not in root.worldbody.all_children()


def test_attach_prefixing():
  arena = mjcf.RootElement(model='arena')
  arena.worldbody.add('geom', name='floor', type='plane',
                      size=[5, 5, 0.1])
  robot = mjcf.RootElement(model='robot')
  torso = robot.worldbody.add('body', name='torso', pos=[0, 0, 0.5])
  torso.add('joint', name='lift', type='slide', axis=[0, 0, 1])
  torso.add('geom', name='chassis', type='sphere', size=[0.2],
            mass=1.0)
  robot.actuator.add('motor', name='up', joint='lift')

  frame = arena.attach(robot)
  assert frame.name == 'robot/'
  xml = arena.to_xml_string()
  assert 'name="robot/torso"' in xml
  assert 'name="robot/up"' in xml
  assert 'joint="robot/lift"' in xml

  # attached tree still findable through the parent
  assert arena.find('body', 'robot/torso') is torso

  # compiles end to end
  import dm_control_tpu.models as M
  m = M.from_xml_string(xml)
  assert m.names.name2id('body', 'robot/torso') >= 1
  assert m.nu == 1


def test_parse_roundtrip():
  xml = """
  <mujoco model="rt">
    <option timestep="0.01"/>
    <worldbody>
      <geom name="floor" type="plane" size="1 1 .1"/>
      <body name="b" pos="0 0 .3">
        <joint name="j" type="hinge"/>
        <geom name="g" type="capsule" fromto="0 0 0 0 0 .2"
              size=".02"/>
      </body>
    </worldbody>
    <actuator><motor name="m" joint="j"/></actuator>
  </mujoco>"""
  root = mjcf.from_xml_string(xml)
  assert root.find('joint', 'j') is not None
  out = root.to_xml_string()
  root2 = mjcf.from_xml_string(out)
  assert root2.find('geom', 'g').type == 'capsule'
  np.testing.assert_allclose(root2.find('body', 'b').pos, [0, 0, .3])
