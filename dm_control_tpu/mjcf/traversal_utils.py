"""Traversal helpers over PyMJCF element trees
(behavioural counterpart of reference
dm_control/mjcf/traversal_utils.py:15-110).
"""

_ACTUATOR_TAGS = ('general', 'motor', 'position',
                  'velocity', 'cylinder', 'muscle')


def get_freejoint(element):
  """The free joint of a body, or None."""
  if element is None or element.tag != 'body':
    return None
  for child in element.get_children('freejoint'):
    return child
  for joint in element.get_children('joint'):
    if joint.type == 'free':
      return joint
  return None


def get_attachment_frame(mjcf_model):
  """The frame body an attached model is mounted on, or None."""
  parent = getattr(mjcf_model, '_parent_root', None)
  if parent is None:
    return None
  for frame, sub, _ in parent._attachments:
    if sub is mjcf_model:
      return frame
  return None


def get_frame_freejoint(mjcf_model):
  return get_freejoint(get_attachment_frame(mjcf_model))


def get_frame_joints(mjcf_model):
  """All joints directly under the model's attachment frame."""
  frame = get_attachment_frame(mjcf_model)
  if frame is None:
    return None
  return (frame.get_children('freejoint')
          + frame.get_children('joint'))


def commit_defaults(element, attributes=None):
  """Copies applicable default-class values into an element's own
  attributes (so the element is self-describing when detached)."""
  root = element.root
  # resolve the element's default class: own dclass, else nearest
  # ancestor childclass, else the global default
  dclass = element.get_attributes().get('class')
  node = element.parent
  while dclass is None and node is not None and node is not root:
    dclass = node.get_attributes().get('childclass')
    node = node.parent

  chain = _default_chain(root, dclass)
  for default_elem in chain:
    for proto in default_elem.get_children(element.tag):
      for key, value in proto.get_attributes().items():
        if attributes is not None and key not in attributes:
          continue
        if element.get_attributes().get(key) is None:
          element.set_attributes(**{key: value})


def _default_chain(root, dclass):
  """Default elements from most to least specific for `dclass`."""
  top = None
  for child in root.all_children():
    if child.tag == 'default':
      top = child
      break
  if top is None:
    return []
  chain = []

  def walk(d, path):
    name = d.get_attributes().get('class')
    path = path + [d]
    if name == dclass:
      chain.extend(reversed(path))
      return True
    for sub in d.get_children('default'):
      if walk(sub, path):
        return True
    return False

  if dclass is not None and walk(top, []):
    return chain
  return [top]
