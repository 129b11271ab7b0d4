"""Keyboard/mouse abstractions for the viewer
(behavioural counterpart of reference dm_control/viewer/user_input.py).

Key codes follow the GLFW numbering the reference uses so embedders can
feed raw events; the InputMap dispatches (key, modifiers) combinations
to bound callbacks.
"""

RELEASE = 0
PRESS = 1
REPEAT = 2

KEY_SPACE = 32
KEY_APOSTROPHE = 39
KEY_MINUS = 45
KEY_EQUAL = 61
KEY_0 = 48
KEY_9 = 57
KEY_A = 65
KEY_F = 70
KEY_P = 80
KEY_R = 82
KEY_S = 83
KEY_V = 86
KEY_ESCAPE = 256
KEY_ENTER = 257
KEY_TAB = 258
KEY_BACKSPACE = 259
KEY_RIGHT = 262
KEY_LEFT = 263
KEY_DOWN = 264
KEY_UP = 265
KEY_PAGE_UP = 266
KEY_PAGE_DOWN = 267
KEY_F1 = 290
KEY_F2 = 291
KEY_F5 = 294

MOD_NONE = 0
MOD_SHIFT = 1
MOD_CONTROL = 2
MOD_ALT = 4

MOUSE_BUTTON_LEFT = 0
MOUSE_BUTTON_RIGHT = 1
MOUSE_BUTTON_MIDDLE = 2


class Exclusive:
  """Marks a binding active between PRESS and RELEASE of its combo."""

  def __init__(self, combination):
    self.combination = combination


class Range:
  """Marks a binding accepting a sequence of alternative combos."""

  def __init__(self, combinations):
    self.combinations = list(combinations)


class InputMap:
  """Maps key combinations to callbacks."""

  def __init__(self):
    self._bindings = {}        # (key, modifiers) -> callable
    self._exclusive = {}       # (key, modifiers) -> callable(bool)
    self._active_exclusive = None

  def bind(self, callback, binding):
    """Binds `callback` to a key, (key, modifiers), Exclusive or Range."""
    if isinstance(binding, Exclusive):
      combo = self._normalize(binding.combination)
      self._exclusive[combo] = callback
      return
    if isinstance(binding, Range):
      for i, combo in enumerate(binding.combinations):
        self._bindings[self._normalize(combo)] = (
            lambda cb=callback, idx=i: cb(idx))
      return
    self._bindings[self._normalize(binding)] = callback

  def _normalize(self, combination):
    if isinstance(combination, tuple):
      return combination
    return (combination, MOD_NONE)

  def handle_key(self, key, action, modifiers=MOD_NONE):
    """Feeds one key event; returns True when consumed."""
    combo = (key, modifiers)
    if self._active_exclusive is not None:
      active_combo, callback = self._active_exclusive
      if combo == active_combo and action == RELEASE:
        callback(False)
        self._active_exclusive = None
        return True
      return False
    if combo in self._exclusive and action == PRESS:
      self._exclusive[combo](True)
      self._active_exclusive = (combo, self._exclusive[combo])
      return True
    if combo in self._bindings and action in (PRESS, REPEAT):
      self._bindings[combo]()
      return True
    return False

  def clear_bindings(self):
    self._bindings.clear()
    self._exclusive.clear()
    self._active_exclusive = None
