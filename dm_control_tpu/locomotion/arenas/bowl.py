"""Bowl arena with sinusoidal bumpy terrain
(behavioural counterpart of reference
dm_control/locomotion/arenas/bowl.py:34-134).

The heightfield is regenerated per episode directly into the device
model's `hfield_data` via `Physics.update_model_field` — the TPU
equivalent of the reference's in-place mjModel write + GL re-upload
(our ray-caster renderer reads hfield_data from the same device array,
so no separate upload step exists).
"""

import numpy as np
from scipy import ndimage

from dm_control_tpu import composer

_TOP_CAMERA_DISTANCE = 100
_TOP_CAMERA_Y_PADDING_FACTOR = 1.1

_TERRAIN_SMOOTHNESS = .5  # 0.0: maximally bumpy; 1.0: completely smooth.
_TERRAIN_BUMP_SCALE = .2  # Spatial scale of terrain bumps (in meters).


class Bowl(composer.Arena):
  """A bowl arena with sinusoidal bumps."""

  def _build(self, size=(10, 10), aesthetic='default', name='bowl'):
    super()._build(name=name)
    del aesthetic  # textures are not used by the analytic ray-caster

    self._hfield = self._mjcf_root.asset.add(
        'hfield', name='terrain', nrow=201, ncol=201,
        size=(6, 6, 0.5, 0.1))
    self._terrain_geom = self._mjcf_root.worldbody.add(
        'geom', name='terrain', type='hfield',
        rgba=(0.2, 0.3, 0.4, 1), pos=(0, 0, -0.01), hfield='terrain')
    self._ground_geom = self._mjcf_root.worldbody.add(
        'geom', type='plane', name='groundplane',
        rgba=(0.2, 0.3, 0.4, 1), size=list(size) + [0.5])

    self._mjcf_root.visual.add(
        'headlight', ambient=[.4, .4, .4], diffuse=[.8, .8, .8],
        specular=[.1, .1, .1])

    self._regenerate = True

  def regenerate(self, random_state):
    # actual regeneration needs compiled physics; deferred to episode init
    del random_state
    self._regenerate = True

  def initialize_episode(self, physics, random_state):
    if not self._regenerate:
      return
    self._regenerate = False

    model = physics.model
    res = int(model.hfield_nrow[0])
    assert res == int(model.hfield_ncol[0])

    # Sinusoidal bowl shape.
    row_grid, col_grid = np.ogrid[-1:1:res * 1j, -1:1:res * 1j]
    radius = np.clip(np.sqrt(col_grid ** 2 + row_grid ** 2), .1, 1)
    bowl_shape = .5 - np.cos(2 * np.pi * radius) / 2

    # Random smooth bumps.
    terrain_size = 2 * float(np.asarray(model.hfield_size)[0, 0])
    bump_res = int(terrain_size / _TERRAIN_BUMP_SCALE)
    bumps = random_state.uniform(
        _TERRAIN_SMOOTHNESS, 1, (bump_res, bump_res))
    smooth_bumps = ndimage.zoom(bumps, res / float(bump_res))

    terrain = (bowl_shape * smooth_bumps).astype(
        np.asarray(model.hfield_size).dtype)
    data = np.array(physics.model.hfield_data)
    start = int(model.hfield_adr[0])
    data[start:start + res ** 2] = terrain.ravel()
    physics.update_model_field('hfield_data', data)

  @property
  def ground_geoms(self):
    return (self._terrain_geom, self._ground_geom)
