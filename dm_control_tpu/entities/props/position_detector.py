"""Axis-aligned region detector
(reference entities/props/position_detector.py:42-220).

Detects registered entities whose geom centers lie inside (or, in
inverted mode, outside) an axis-aligned box. 2D mode (len(pos) == 2)
ignores the z coordinate.
"""

from __future__ import annotations

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu import mjcf

_RENDERED_HEIGHT_IN_2D_MODE = 0.02


def _ensure_3d(pos):
  if len(pos) == 2:
    return np.hstack([pos, [0.0]])
  return np.asarray(pos, dtype=float)


class PositionDetector(composer.Entity):
  """Non-contact region detector over registered entities."""

  def _build(self, pos, size, inverted=False, visible=False,
             rgba=(1, 1, 1, 1), detected_rgba=(0, 1, 0, 0.25),
             retain_substep_detections=False,
             name='position_detector'):
    if len(pos) != len(size):
      raise ValueError('`pos` and `size` should have the same length: '
                       f'got {pos!r} and {size!r}')
    self._inverted = inverted
    self._detected = False
    self._retain = retain_substep_detections
    self._2d = len(pos) == 2
    self._lower = np.array(pos, dtype=float) - np.array(size,
                                                        dtype=float)
    self._upper = np.array(pos, dtype=float) + np.array(size,
                                                        dtype=float)
    self._entities = []

    render_pos = np.zeros(3)
    render_pos[:len(pos)] = pos
    render_size = np.full(3, _RENDERED_HEIGHT_IN_2D_MODE)
    render_size[:len(size)] = size
    self._mjcf_root = mjcf.RootElement(model=name)
    self._site = self._mjcf_root.worldbody.add(
        'site', name='detection_zone', type='box', pos=render_pos,
        size=render_size, rgba=list(rgba),
        group=3 if not visible else 0)

  @property
  def mjcf_model(self):
    return self._mjcf_root

  @property
  def lower(self):
    return self._lower

  @property
  def upper(self):
    return self._upper

  def resize(self, pos, size):
    """Re-centers/re-sizes the detection region and its site."""
    pos = np.asarray(pos, dtype=float)
    size = np.asarray(size, dtype=float)
    self._lower = pos - size
    self._upper = pos + size
    render_pos = np.zeros(3)
    render_pos[:len(pos)] = pos
    render_size = np.full(3, _RENDERED_HEIGHT_IN_2D_MODE)
    render_size[:len(size)] = size
    self._site.pos = render_pos
    self._site.size = render_size

  @property
  def detected_entities(self):
    return [e for e, d in self._entities if d]

  def register_entities(self, *entities):
    for entity in entities:
      self._entities.append([entity, False])

  def deregister_entities(self):
    self._entities = []

  @property
  def detected(self):
    return any(d for _, d in self._entities)

  def site_pos(self, physics):
    return np.asarray(physics.bind(self._site).xpos)

  def _inside(self, physics, entity):
    geoms = entity.mjcf_model.find_all('geom')
    if not geoms:
      return False
    center = self.site_pos(physics)
    half = (self._upper - self._lower) / 2
    ndim = 2 if self._2d else 3
    for g in geoms:
      p = np.asarray(physics.bind(g).xpos)
      rel = np.abs(p[:ndim] - center[:ndim])
      inside = np.all(rel <= half[:ndim])
      if inside != self._inverted:
        return True
    return False

  def initialize_episode(self, physics, random_state):
    for rec in self._entities:
      rec[1] = False
    self.after_substep(physics, random_state)

  def after_substep(self, physics, random_state):
    for rec in self._entities:
      now = self._inside(physics, rec[0])
      rec[1] = (rec[1] or now) if self._retain else now
