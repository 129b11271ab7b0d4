"""Copy element subtrees between PyMJCF models
(behavioural counterpart of reference dm_control/mjcf/copier.py:22-80).
"""


class Copier:
  """Copies the children/attributes of a source element into targets."""

  def __init__(self, source):
    self._source = source

  def copy_into(self, destination, override_attributes=False):
    """Recursively copies source attributes + children into
    `destination`. Without `override_attributes`, conflicting existing
    attribute values raise a ValueError."""
    self._copy(self._source, destination, override_attributes)
    return destination

  def _copy(self, src, dst, override):
    for key, value in src.get_attributes().items():
      existing = dst.get_attributes().get(key)
      if existing is not None and not override:
        if _to_comparable(existing) != _to_comparable(value):
          raise ValueError(
              'Attribute {!r} conflicts (source {!r} vs destination '
              '{!r}); pass override_attributes=True to overwrite.'
              .format(key, value, existing))
        continue
      dst.set_attributes(**{key: value})
    for child in src.all_children():
      # reuse an identifiable same-named child; otherwise create one
      target = None
      name = child.get_attributes().get('name')
      if name is not None:
        for existing_child in dst.get_children(child.tag):
          if existing_child.get_attributes().get('name') == name:
            target = existing_child
            break
      if target is None:
        target = dst.add(child.tag)
      self._copy(child, target, override)


def _to_comparable(value):
  try:
    import numpy as np
    arr = np.asarray(value)
    if arr.dtype != object:
      return tuple(np.ravel(arr).tolist())
  except Exception:
    pass
  return value
