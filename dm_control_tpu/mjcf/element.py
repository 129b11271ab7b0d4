"""The MJCF object model: a programmatic scene-description tree.

Counterpart of the reference PyMJCF element layer
(dm_control/mjcf/element.py:134-1326): schema-driven elements with typed
attributes, per-root name scoping, find/find_all, model attachment with
name prefixing, and XML round-trip. The surface is the subset the
composer stack consumes; it grows with the framework.
"""

from __future__ import annotations

import copy as copy_lib
from typing import Dict, List, Optional, Sequence, Union
from xml.etree import ElementTree

import numpy as np

from dm_control_tpu.mjcf import schema as schema_lib


class Error(Exception):
  pass


def _attr_to_str(value) -> str:
  if isinstance(value, (bool, np.bool_)):
    return 'true' if value else 'false'
  if isinstance(value, str):
    return value
  if isinstance(value, Element):
    # element-valued reference attrs (e.g. sensor objname=geom_element)
    # store the referenced element's LOCAL name; serialization applies
    # the attachment prefix to reference-kind attrs (same-model refs)
    name = value._attrs.get('name')
    if name is None:
      raise Error(f'cannot reference unnamed element {value!r}')
    return name
  if isinstance(value, (int, np.integer)):
    return str(int(value))
  if isinstance(value, (float, np.floating)):
    return repr(float(value))
  arr = np.asarray(value).ravel()
  return ' '.join(repr(float(x)) if not float(x).is_integer()
                  else str(int(x)) for x in arr)


def _parse_attr(kind: str, value: str):
  if kind == 'float':
    return float(value)
  if kind == 'int':
    return int(value)
  if kind == 'bool':
    return value.lower() in ('true', '1')
  if kind == 'array':
    return np.array([float(x) for x in value.split()])
  return value  # str / keyword / identifier / reference


class Element:
  """One MJCF element."""

  __slots__ = ('tag', '_attrs', '_children', '_parent', '_root',
               'spec')

  def __init__(self, tag: str, parent: Optional['Element'],
               root: Optional['RootElement']):
    if tag in schema_lib.SCHEMA:
      self.spec = schema_lib.SCHEMA[tag]
    elif parent is not None and parent.tag in ('fixed', 'spatial'):
      # tendon sub-elements: joint / site / geom under a tendon
      attrs = {'joint': schema_lib.TENDON_JOINT_ATTRS,
               'site': schema_lib.TENDON_SITE_ATTRS,
               'geom': schema_lib.TENDON_GEOM_ATTRS}[tag]
      self.spec = {'attributes': attrs, 'children': (),
                   'repeatable': True, 'identifier': None}
    else:
      raise Error(f'unknown element kind {tag!r}')
    self.tag = tag
    self._attrs: Dict[str, object] = {}
    self._children: List[Element] = []
    self._parent = parent
    self._root = root

  # ---------------- attributes ----------------
  def get_attributes(self) -> Dict[str, object]:
    return dict(self._attrs)

  def set_attributes(self, **kwargs):
    for k, v in kwargs.items():
      setattr(self, k, v)

  def __getattr__(self, name):
    # __slots__ fields fall through to here only if missing
    if name.startswith('_'):
      raise AttributeError(name)
    name_key = 'class' if name == 'dclass' else name
    spec = object.__getattribute__(self, 'spec')
    attrs = object.__getattribute__(self, '_attrs')
    if name_key in spec['attributes']:
      return attrs.get(name_key)
    # section access on non-root containers (e.g. body children)
    raise AttributeError(
        f'{self.tag!r} element has no attribute {name!r}')

  def __setattr__(self, name, value):
    if name in Element.__slots__:
      object.__setattr__(self, name, value)
      return
    name_key = 'class' if name == 'dclass' else name
    if name_key in self.spec['attributes']:
      if value is None:
        self._attrs.pop(name_key, None)
        return
      kind, _ = self.spec['attributes'][name_key]
      if kind == 'identifier' and self._root is not None:
        old = self._attrs.get(name_key)
        ns = self.spec['identifier']
        if old is not None:
          self._root._namescope[ns].pop(old, None)
        if value in self._root._namescope.setdefault(ns, {}):
          raise Error(f'duplicate {ns} name {value!r}')
        self._root._namescope[ns][value] = self
      if kind == 'array' and isinstance(value, str):
        value = _parse_attr('array', value)
      elif kind in ('float', 'int') and isinstance(value, str):
        value = _parse_attr(kind, value)
      self._attrs[name_key] = value
      return
    raise Error(
        f'{self.tag!r} element has no attribute {name!r}; valid: '
        f'{sorted(self.spec["attributes"])}')

  # ---------------- structure ----------------
  @property
  def parent(self):
    return self._parent

  @property
  def root(self):
    return self._root

  def add(self, tag: str, **kwargs) -> 'Element':
    if tag not in self.spec['children']:
      raise Error(
          f'{self.tag!r} cannot contain {tag!r}; valid children: '
          f'{self.spec["children"]}')
    child = Element(tag, self, self._root)
    self._children.append(child)
    for k, v in kwargs.items():
      setattr(child, k, v)
    return child

  def insert(self, index: int, tag: str, **kwargs) -> 'Element':
    child = self.add(tag, **kwargs)
    self._children.remove(child)
    self._children.insert(index, child)
    return child

  def remove(self):
    if self._parent is None:
      raise Error('cannot remove a root element')
    ns = self.spec['identifier']
    name = self._attrs.get('name')
    if ns and name and self._root is not None:
      self._root._namescope.get(ns, {}).pop(name, None)
    self._parent._children.remove(self)
    self._parent = None

  def all_children(self) -> List['Element']:
    return list(self._children)

  def get_children(self, tag: str) -> List['Element']:
    return [c for c in self._children if c.tag == tag]

  @property
  def name(self):
    return self._attrs.get('name')

  @property
  def full_identifier(self):
    """Identifier including attachment prefixes."""
    prefix = self._root._prefix if self._root is not None else ''
    n = self._attrs.get('name')
    return f'{prefix}{n}' if n else None

  # ---------------- search ----------------
  def find(self, namespace: str, identifier: str):
    root = self._root
    hit = root._namescope.get(namespace, {}).get(identifier)
    if hit is not None:
      return hit
    # search attached subtrees with prefixed identifiers
    for frame, sub, prefix in root._attachments:
      if identifier.startswith(prefix):
        found = sub.find(namespace, identifier[len(prefix):])
        if found is not None:
          return found
    return None

  def find_all(self, namespace: str):
    root = self._root
    out = list(root._namescope.get(namespace, {}).values())
    # include unnamed elements of the namespace by tree walk; <default>
    # subtrees hold class templates, not model elements
    named = set(id(e) for e in out)
    def walk(e):
      for c in e._children:
        if c.tag == 'default':
          continue
        if c.spec['identifier'] == namespace and id(c) not in named:
          out.append(c)
        walk(c)
    walk(root)
    for frame, sub, prefix in root._attachments:
      out.extend(sub.find_all(namespace))
    return out

  # ---------------- serialization ----------------
  def _to_etree(self, prefix: str, parent_et) -> None:
    et = ElementTree.SubElement(parent_et, self.tag)
    for k, v in self._attrs.items():
      kind, _ = self.spec['attributes'][k]
      sval = _attr_to_str(v)
      if prefix and kind == 'identifier':
        sval = prefix + sval
      elif prefix and kind.startswith('reference:'):
        ref_ns = kind.split(':', 1)[1]
        if ref_ns != 'default' or sval != 'main':
          sval = prefix + sval
      et.set(k, sval)
    for c in self._children:
      c._to_etree(prefix, et)

  def __repr__(self):
    n = self._attrs.get('name')
    return (f'<mjcf {self.tag}' + (f' {n!r}' if n else '') +
            f' at {hex(id(self))}>')


class RootElement(Element):
  """The <mujoco> root of an MJCF model tree."""

  __slots__ = ('_namescope', '_attachments', '_assets', '_prefix',
               '_sections')

  _SECTIONS = ('compiler', 'option', 'asset', 'worldbody', 'contact',
               'equality', 'tendon', 'actuator', 'sensor', 'keyframe',
               'default', 'visual', 'statistic', 'size')

  def __init__(self, model: str = 'unnamed'):
    object.__setattr__(self, '_namescope', {})
    object.__setattr__(self, '_attachments', [])
    object.__setattr__(self, '_assets', {})
    object.__setattr__(self, '_prefix', '')
    object.__setattr__(self, '_sections', {})
    super().__init__('mujoco', None, None)
    self._root = self
    self._attrs['model'] = model

  def __getattr__(self, name):
    if name in RootElement._SECTIONS:
      sections = object.__getattribute__(self, '_sections')
      if name not in sections:
        child = Element(name, self, self)
        self._children.append(child)
        sections[name] = child
      return sections[name]
    return super().__getattr__(name)

  def __setattr__(self, name, value):
    if name in RootElement.__slots__ or name in Element.__slots__:
      object.__setattr__(self, name, value)
      return
    super().__setattr__(name, value)

  @property
  def model(self):
    return self._attrs.get('model')

  # ---------------- attachment ----------------
  def attach(self, other: 'RootElement',
             site: Optional[Element] = None) -> Element:
    """Attaches another model; returns the attachment frame body."""
    prefix = (other.model or 'attachment') + '/'
    existing = [p for _, _, p in self._attachments]
    i = 1
    base = prefix
    while prefix in existing:
      i += 1
      prefix = f'{base[:-1]}_{i}/'
    object.__setattr__(other, '_prefix', prefix)
    parent = site.parent if site is not None else self.worldbody
    frame = parent.add('body', name=f'{prefix}')
    if site is not None:
      if site.pos is not None:
        frame.pos = site.pos
      for ori in ('quat', 'euler', 'zaxis', 'xyaxes'):
        v = site._attrs.get(ori)
        if v is not None:
          setattr(frame, ori, v)
    self._attachments.append((frame, other, prefix))
    return frame

  def detach(self):
    """Detaches this model from its parent (if attached)."""
    # find the parent that holds us
    raise NotImplementedError(
        'detach from the parent side: remove the attachment frame')

  def get_assets(self) -> Dict[str, bytes]:
    assets = dict(self._assets)
    for _, sub, _ in self._attachments:
      assets.update(sub.get_assets())
    return assets

  # ---------------- serialization ----------------
  def to_xml(self) -> ElementTree.Element:
    et = ElementTree.Element('mujoco')
    et.set('model', str(self._attrs.get('model', 'unnamed')))
    self._serialize_into(et, '')
    return et

  def _serialize_into(self, et, prefix: str):
    # serialize own children (merging sections on attach)
    for c in self._children:
      if c.tag == 'worldbody':
        continue
      c._to_etree(prefix, et)
    world_et = ElementTree.SubElement(et, 'worldbody')
    if 'worldbody' in self._sections:
      for c in self._sections['worldbody']._children:
        c._to_etree(prefix, world_et)
    # attachments: splice their non-worldbody sections and mount their
    # worldbody children under the attachment frame
    for frame, sub, sub_prefix in self._attachments:
      full_prefix = prefix + sub_prefix
      # frame body already serialized above (it is in our worldbody);
      # locate it and append the attached worldbody children
      frame_et = None
      for b in world_et.iter('body'):
        if b.get('name') == prefix + sub_prefix:
          frame_et = b
          break
      if frame_et is None:
        frame_et = ElementTree.SubElement(world_et, 'body',
                                          name=prefix + sub_prefix)
      if 'worldbody' in sub._sections:
        for c in sub._sections['worldbody']._children:
          c._to_etree(full_prefix, frame_et)
      for tag in ('option', 'compiler', 'asset', 'contact', 'equality',
                  'tendon', 'actuator', 'sensor', 'default',
                  'keyframe'):
        if tag in sub._sections:
          sec = sub._sections[tag]
          if not sec._children and not sec._attrs:
            continue
          target = et.find(tag)
          if target is None:
            target = ElementTree.SubElement(et, tag)
          for c in sec._children:
            c._to_etree(full_prefix, target)

  def to_xml_string(self, pretty: bool = True) -> str:
    et = self.to_xml()
    if pretty:
      ElementTree.indent(et)
    return ElementTree.tostring(et, encoding='unicode')

  def __repr__(self):
    return f'<mjcf RootElement {self.model!r} at {hex(id(self))}>'


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------


def from_xml_string(xml_string: str) -> RootElement:
  et = ElementTree.fromstring(xml_string)
  if et.tag != 'mujoco':
    raise Error(f'expected <mujoco> root, got <{et.tag}>')
  root = RootElement(model=et.get('model', 'unnamed'))
  for child in et:
    _parse_into(root, child)
  return root


def from_path(path: str) -> RootElement:
  with open(path) as f:
    return from_xml_string(f.read())


def _parse_into(parent: Element, et) -> None:
  tag = et.tag
  if tag in RootElement._SECTIONS and isinstance(parent, RootElement):
    elem = getattr(parent, tag)
    for k, v in et.attrib.items():
      _set_raw(elem, k, v)
  else:
    try:
      elem = parent.add(tag)
    except Error:
      return  # skip unsupported elements (visual details etc.)
    for k, v in et.attrib.items():
      _set_raw(elem, k, v)
  for child in et:
    _parse_into(elem, child)


def _set_raw(elem: Element, key: str, value: str):
  spec = elem.spec['attributes']
  if key not in spec:
    return
  kind, _ = spec[key]
  try:
    setattr(elem, 'dclass' if key == 'class' else key,
            _parse_attr(kind, value))
  except Error:
    pass
