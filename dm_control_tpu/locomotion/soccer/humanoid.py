"""CMU humanoid specialized for soccer.

Behavioral contract: reference locomotion/soccer/humanoid.py — a
position-controlled CMU humanoid with team marker coloring, a walker
id, hidden-hand visual polish, and no tracking light (multi-walker
scenes). The reference's JERSEY visual is a skinned mesh; the on-device
ray-caster shades geoms, so jersey mode here colors the torso/limb
geoms in the team color instead of texturing a skin.
"""

from __future__ import annotations

import enum

import numpy as np

from dm_control_tpu.locomotion.walkers import cmu_humanoid

_MAX_WALKER_ID = 10

# geoms tinted with the team color (face/feet/torso girdle)
_MARKER_GEOM_NAMES = ('lowerneck', 'lclavicle', 'rclavicle', 'thorax',
                      'upperback', 'lowerback', 'rfemur', 'lfemur')


class Humanoid(cmu_humanoid.CMUHumanoidPositionControlled):
  """A CMU humanoid walker visually specialized for soccer."""

  class Visual(enum.Enum):
    GEOM = 1
    JERSEY = 2

  def _build(self, visual=None, marker_rgba=(1, 0, 0, 1),
             walker_id=None, initializer=None, name='walker'):
    visual = visual or Humanoid.Visual.GEOM
    if not isinstance(visual, Humanoid.Visual):
      raise ValueError('`visual` must be one of `Humanoid.Visual`.')
    marker_rgba = list(marker_rgba)
    if len(marker_rgba) != 4:
      raise ValueError('`marker_rgba` must be a sequence of length 4.')
    if walker_id is None and visual != Humanoid.Visual.GEOM:
      raise ValueError('`walker_id` must be set unless `visual` is '
                       'set to `Visual.GEOM`.')
    if walker_id is not None and not 0 <= walker_id <= _MAX_WALKER_ID:
      raise ValueError(
          f'walker_id must be in [0-{_MAX_WALKER_ID}], '
          f'got: {walker_id}.')
    self._walker_id = walker_id
    if visual == Humanoid.Visual.GEOM:
      marker_rgba[-1] = .7

    super()._build(marker_rgba=marker_rgba, initializer=initializer,
                   include_face=True)
    self._mjcf_root.model = name

    # hands: hide physical geoms behind slightly larger visual shells
    for hand_name in ('lhand', 'rhand'):
      hand = self._mjcf_root.find('body', hand_name)
      if hand is None:
        continue
      for geom in list(hand.find_all('geom')):
        geom.rgba = (0, 0, 0, 0)
        scale = 1.3 if geom.name == hand_name else 1.5
        geom.parent.add(
            'geom', name=(geom.name or hand_name) + '_visual',
            type=geom.type, quat=geom.quat, mass=0, contype=0,
            conaffinity=0, size=np.asarray(geom.size) * scale,
            pos=None if geom.pos is None else np.asarray(geom.pos) * 1.5)

    # one headlight per scene is plenty with 2N walkers on the pitch
    light = self._mjcf_root.find('light', 'tracking_light')
    if light is not None:
      light.remove()

    if visual == Humanoid.Visual.JERSEY:
      # rasterizer jersey: tint the torso/limb geoms the team color
      team_rgba = tuple(marker_rgba[:3]) + (1.,)
      for geom_name in _MARKER_GEOM_NAMES:
        geom = self._mjcf_root.find('geom', geom_name)
        if geom is not None:
          geom.rgba = team_rgba

  @property
  def walker_id(self):
    return self._walker_id

  @property
  def marker_geoms(self):
    found = []
    face = self._mjcf_root.find('geom', 'face')
    if face is not None:
      found.append(face)
    for body_name in ('rfoot', 'lfoot'):
      body = self._mjcf_root.find('body', body_name)
      if body is not None:
        found.extend(body.find_all('geom'))
    for geom_name in _MARKER_GEOM_NAMES:
      geom = self._mjcf_root.find('geom', geom_name)
      if geom is not None:
        found.append(geom)
    return found
