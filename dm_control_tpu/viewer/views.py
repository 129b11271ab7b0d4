"""Text overlay views for the viewer
(behavioural counterpart of reference dm_control/viewer/views.py).

The TPU viewer is headless-first: views produce structured rows of
(label, value) text which the application composes into the status
overlay (and an embedder could rasterize on top of rendered frames).
"""

import abc
import enum


class PanelLocation(enum.Enum):
  TOP_LEFT = 0
  TOP_RIGHT = 1
  BOTTOM_LEFT = 2
  BOTTOM_RIGHT = 3


class BaseViewportView(metaclass=abc.ABCMeta):
  """A view that can be rendered into a viewport."""

  @abc.abstractmethod
  def render(self, context, viewport):
    """Renders the view (context: accumulating overlay list)."""


class ColumnTextModel(metaclass=abc.ABCMeta):
  """Data model for two-column text views."""

  @abc.abstractmethod
  def get_columns(self):
    """Returns a list of (label, value) string tuples."""


class ColumnTextView(BaseViewportView):
  """A two-column text overlay."""

  def __init__(self, model,
               location=PanelLocation.TOP_LEFT):
    self._model = model
    self.location = location

  def render(self, context, viewport):
    del viewport
    rows = self._model.get_columns()
    if rows:
      context.append((self.location, rows))


class ViewportLayout:
  """A collection of views rendered together each frame."""

  def __init__(self):
    self._views = []

  def add(self, view):
    if view not in self._views:
      self._views.append(view)

  def remove(self, view):
    if view in self._views:
      self._views.remove(view)

  def __len__(self):
    return len(self._views)

  def render(self, viewport=None):
    """Renders every view; returns the composed overlay rows."""
    context = []
    for view in self._views:
      view.render(context, viewport)
    return context
