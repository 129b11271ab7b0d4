"""XML helpers over stdlib ElementTree (reference
dm_control/utils/xml_tools.py, re-based off lxml).

The tree objects here are `xml.etree.ElementTree` elements — the repo
carries no lxml dependency anywhere (SURVEY §2.1).
"""

from __future__ import annotations

import copy
import io
from xml.etree import ElementTree as ET


def find_element(root, tag, name):
  """First descendant with the given tag whose name attribute matches.

  Raises ValueError when nothing in the subtree qualifies.
  """
  for node in root.iter(tag):
    if node.get('name') == name:
      return node
  raise ValueError(
      f'no <{tag}> element named {name!r} under {root!r}')


def nested_element(element, depth):
  """Nests copies of `element` inside itself `depth` levels deep."""
  if depth > 0:
    element.append(nested_element(copy.deepcopy(element), depth - 1))
  return element


def parse(file_obj):
  """Parses XML from a path, file object, or string, stripping the
  inter-element whitespace so re-serialization can re-indent cleanly."""
  if isinstance(file_obj, (str, bytes)) and not (
      isinstance(file_obj, str) and file_obj.lstrip().startswith('<')):
    tree = ET.parse(file_obj)
  else:
    if isinstance(file_obj, str):
      file_obj = io.StringIO(file_obj)
    elif isinstance(file_obj, bytes):
      file_obj = io.BytesIO(file_obj)
    tree = ET.parse(file_obj)
  for node in tree.getroot().iter():
    if node.text is not None and not node.text.strip():
      node.text = None
    if node.tail is not None and not node.tail.strip():
      node.tail = None
  return tree
