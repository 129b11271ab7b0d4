# Spec constants in this file reproduce task-specification values from
# dm_control (github.com/google-deepmind/dm_control), Copyright The
# dm_control Authors, Apache License 2.0.
"""Suite-specific arena class (reference manipulation/shared/arenas.py).

Visual-only assets (skybox/checker textures) are omitted: rendering
goes through the on-device ray-caster, which shades from geom rgba.
"""

from dm_control_tpu import composer


class Standard(composer.Arena):
  """The standard manipulation arena: ground plane + light."""

  def _build(self, name='arena'):
    super()._build(name=name)
    self.mjcf_model.worldbody.add(
        'geom', name='ground', type='plane', size=[1, 1, 0.1],
        friction=[0.4], solimp=[0.95, 0.99, 0.001], solref=[0.002, 1],
        rgba=[0.24, 0.32, 0.4, 1])
    self.mjcf_model.worldbody.add(
        'light', pos=[0, 0, 1.5], dir=[0, 0, -1],
        diffuse=[0.7, 0.7, 0.7], specular=[.3, .3, .3],
        directional='false', castshadow='true')

  @property
  def ground(self):
    return self.mjcf_model.find('geom', 'ground')
