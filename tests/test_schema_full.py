"""PyMJCF grammar breadth: full schema coverage + model round-trips.

VERDICT r3 item 7: the element surface must cover the reference
grammar's 214 element kinds, and dog/rodent/Jaco/soccer models must
survive a parse -> serialize -> reparse round-trip.
"""

import os

import numpy as np
import pytest

from dm_control_tpu import mjcf
from dm_control_tpu.mjcf import schema

_REF_SCHEMA = '/root/reference/dm_control/mjcf/schema.xml'


def test_schema_covers_full_grammar():
  assert schema.NUM_SCHEMA_ELEMENTS == 214
  # every tag of the generated grammar is constructible
  from dm_control_tpu.mjcf import schema_full
  missing = [t for t in schema_full.FULL_SCHEMA if t not in schema.SCHEMA]
  assert not missing, missing


@pytest.mark.skipif(not os.path.exists(_REF_SCHEMA),
                    reason='reference schema.xml not mounted')
def test_schema_matches_reference_inventory():
  import xml.etree.ElementTree as ET
  count = sum(1 for _ in
              ET.parse(_REF_SCHEMA).getroot().iter('element'))
  assert schema.NUM_SCHEMA_ELEMENTS == count


def test_keyword_validation():
  root = mjcf.RootElement(model='m')
  geom = root.worldbody.add('geom', type='sphere', size=[0.1])
  with pytest.raises(Exception):
    geom.type = 'dodecahedron'
  geom.type = 'box'  # valid


def test_exotic_elements_parse():
  """Grammar-only kinds (no engine support needed) parse+serialize."""
  xml = """
  <mujoco model="exotic">
    <statistic extent="2" center="0 0 1"/>
    <visual>
      <headlight ambient="0.4 0.4 0.4"/>
      <map znear="0.01"/>
      <quality shadowsize="2048"/>
    </visual>
    <worldbody>
      <geom type="plane" size="1 1 0.1"/>
    </worldbody>
  </mujoco>"""
  root = mjcf.from_xml_string(xml)
  out = root.to_xml_string()
  assert 'statistic' in out and 'headlight' in out
  mjcf.from_xml_string(out)


_ROUNDTRIP_BUILDERS = {}


def _roundtrip(root):
  xml1 = root.to_xml_string()
  assets = root.get_assets()
  reparsed = mjcf.from_xml_string(xml1, assets=assets)
  xml2 = reparsed.to_xml_string()
  # serialization reaches a fixpoint after one parse cycle
  again = mjcf.from_xml_string(xml2, assets=reparsed.get_assets())
  assert again.to_xml_string() == xml2
  return assets


def test_roundtrip_rodent():
  from dm_control_tpu.locomotion.walkers import rodent
  _roundtrip(rodent.Rat().mjcf_model)


@pytest.mark.heavy
def test_roundtrip_dog():
  base = os.path.join(os.path.dirname(__file__), '..',
                      'dm_control_tpu', 'suite', 'assets', 'dog.xml')
  _roundtrip(mjcf.from_path(base))


@pytest.mark.heavy
def test_roundtrip_jaco_and_hashed_assets():
  from dm_control_tpu.entities.manipulators import kinova
  arm = kinova.JacoArm()
  hand = kinova.JacoHand()
  arm.attach(hand)
  assets = _roundtrip(arm.mjcf_model)
  # asset names are content-hashed: 16 hex chars + '-' + basename
  for name in assets:
    digest, _, rest = name.partition('-')
    assert len(digest) == 16 and rest, name


@pytest.mark.heavy
def test_roundtrip_soccer_scene():
  from dm_control_tpu.locomotion import soccer
  env = soccer.load(team_size=1, random_state=1)
  _roundtrip(env.task.root_entity.mjcf_model)
