"""Arena: the root entity others attach into (reference
dm_control/composer/arena.py:26-80)."""

from __future__ import annotations

from dm_control_tpu import mjcf
from dm_control_tpu.composer import entity as entity_lib


class Arena(entity_lib.Entity):
  """An empty arena with a configurable name."""

  def _build(self, name: str = 'arena'):
    self._mjcf_root = mjcf.RootElement(model=name)

  @property
  def mjcf_model(self):
    return self._mjcf_root

  def attach_offset(self, entity, offset, attach_site=None):
    frame = self.attach(entity, attach_site=attach_site)
    frame.pos = offset
    return frame

  def regenerate(self, random_state):
    """Regenerate procedural content per episode (no-op by default;
    reference arenas override — e.g. mazes, corridors)."""

  def add_free_entity(self, entity):
    """Attaches an entity with a free joint (arena.py:62 parity)."""
    frame = self.attach(entity)
    frame.add('freejoint')
    return frame
