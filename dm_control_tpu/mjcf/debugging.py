"""PyMJCF debugging aids: element creation stack traces and annotated
compile failures (behavioural counterpart of reference
dm_control/mjcf/debugging.py:69-366).

When debug mode is on (programmatically or via the
``PYMJCF_DEBUG`` / ``PYMJCF_DEBUG_FULL_DUMP_DIR`` environment
variables), every element creation records the user stack frame that
made it; when a compiled model fails, the failing XML line is mapped
back to that stack so the error points at user code, not generated XML.
"""

import os
import sys
import tempfile
import traceback

_DEBUG_MODE = bool(os.environ.get('PYMJCF_DEBUG'))
_FULL_DUMP_DIR = os.environ.get('PYMJCF_DEBUG_FULL_DUMP_DIR') or None
_STACK_FROZEN = None

# id(element) -> (element repr, stack summary); weak by id since
# Elements define __slots__-style custom setattr
_ELEMENT_STACKS = {}


def debug_mode():
  """Whether PyMJCF debug mode is currently active."""
  return _DEBUG_MODE


def enable_debug_mode():
  global _DEBUG_MODE
  _DEBUG_MODE = True


def disable_debug_mode():
  global _DEBUG_MODE
  _DEBUG_MODE = False


def get_full_dump_dir():
  return _FULL_DUMP_DIR


def set_full_dump_dir(dump_path):
  global _FULL_DUMP_DIR
  _FULL_DUMP_DIR = dump_path
  if dump_path:
    os.makedirs(dump_path, exist_ok=True)


def freeze_current_stack_trace():
  """Stops stack recording at the current frame depth — used by
  library code so traces point at *user* frames."""
  global _STACK_FROZEN
  _STACK_FROZEN = len(traceback.extract_stack())


def unfreeze_stack_traces():
  global _STACK_FROZEN
  _STACK_FROZEN = None


def get_current_stack_trace():
  """The stack trace outside of dm_control_tpu internals."""
  stack = traceback.extract_stack()
  pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  trimmed = [f for f in stack
             if not os.path.abspath(f.filename).startswith(pkg)
             and 'traceback' not in f.filename]
  if _STACK_FROZEN is not None:
    trimmed = trimmed[:_STACK_FROZEN]
  return trimmed


def register_element_for_debugging(elem):
  """Records the creation stack of `elem` (no-op when debug is off)."""
  if not _DEBUG_MODE:
    return
  _ELEMENT_STACKS[id(elem)] = (
      '<{}>'.format(elem.tag), get_current_stack_trace())


def element_creation_stack(elem):
  entry = _ELEMENT_STACKS.get(id(elem))
  return entry[1] if entry else None


class DebugContext:
  """Maps failing XML lines back to the elements that produced them."""

  def __init__(self):
    self._xml_string = None
    self._line_to_element = {}

  @property
  def debug_mode(self):
    return debug_mode()

  @property
  def default_dump_dir(self):
    return get_full_dump_dir()

  def commit_xml_string(self, xml_string, root=None):
    """Stores the serialized XML and builds a line -> element map by
    re-walking the model (serialization is deterministic)."""
    self._xml_string = xml_string
    if root is not None:
      self._line_to_element = _map_lines_to_elements(xml_string, root)
    return xml_string

  def process_and_raise_last_exception(self):
    """Re-raises the current exception annotated with XML-line and,
    in debug mode, the user stack that created the offending element."""
    exc_type, exc_value, _ = sys.exc_info()
    message = str(exc_value)
    annotation = self._annotate(message)
    dump_path = self.dump_full_debug_info_to_disk()
    extra = '\n'.join(filter(None, [annotation, dump_path and
                                    'Debug dump: ' + dump_path]))
    if extra:
      raise exc_type(f'{message}\n{extra}') from exc_value
    raise

  def _annotate(self, message):
    import re
    if self._xml_string is None:
      return None
    m = re.search(r'[Ll]ine[:\s]+(\d+)', message)
    if not m:
      return None
    lineno = int(m.group(1))
    lines = self._xml_string.split('\n')
    if not 1 <= lineno <= len(lines):
      return None
    out = ['XML line {}: {}'.format(lineno, lines[lineno - 1].strip())]
    elem = self._line_to_element.get(lineno)
    if elem is not None:
      stack = element_creation_stack(elem)
      if stack:
        out.append('Element created at (most recent call last):')
        out.extend('  ' + s.rstrip()
                   for s in traceback.format_list(stack))
    return '\n'.join(out)

  def dump_full_debug_info_to_disk(self, dump_dir=None):
    """Writes the XML (and recorded stacks) to disk; returns the dir."""
    if self._xml_string is None:
      return None
    dump_dir = dump_dir or self.default_dump_dir
    if not dump_dir:
      if not debug_mode():
        return None
      dump_dir = tempfile.mkdtemp(prefix='pymjcf_debug_')
    os.makedirs(dump_dir, exist_ok=True)
    xml_path = os.path.join(dump_dir, 'model.xml')
    with open(xml_path, 'w') as f:
      f.write(self._xml_string)
    if debug_mode():
      with open(os.path.join(dump_dir, 'stacks.txt'), 'w') as f:
        for lineno, elem in sorted(self._line_to_element.items()):
          stack = element_creation_stack(elem)
          if not stack:
            continue
          f.write('line {}:\n'.format(lineno))
          f.writelines('  ' + s for s in traceback.format_list(stack))
          f.write('\n')
    return dump_dir


def _map_lines_to_elements(xml_string, root):
  """Best-effort map XML line numbers to source elements by matching
  tag occurrence order (serialization preserves document order)."""
  order = []

  def walk(e):
    order.append(e)
    for c in e.all_children():
      walk(c)

  for top in root.all_children():
    walk(top)

  mapping = {}
  idx = 0
  for lineno, line in enumerate(xml_string.split('\n'), start=1):
    stripped = line.strip()
    if not stripped.startswith('<') or stripped.startswith('</'):
      continue
    tag = stripped[1:].split()[0].rstrip('/>')
    while idx < len(order) and order[idx].tag != tag:
      idx += 1
    if idx < len(order):
      mapping[lineno] = order[idx]
      idx += 1
  return mapping
