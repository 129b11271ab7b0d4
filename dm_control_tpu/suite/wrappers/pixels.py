"""Pixel-observation wrapper (contract: reference
suite/wrappers/pixels.py — adds a 'pixels' entry rendered each step).

Pixels come from the on-device ray-caster (dm_control_tpu.render), so
`render_kwargs` forward to `Physics.render` (height, width, camera_id,
depth, segmentation).
"""

from dm_env import specs

from dm_control_tpu.suite.wrappers import _base

STATE_KEY = _base.STATE_KEY


class Wrapper(_base.ObservationExtender):
  """Appends rendered pixels to (or replaces) the observation."""

  def __init__(self, env, pixels_only=True, render_kwargs=None,
               observation_key='pixels'):
    super().__init__(env, key=observation_key, drop_wrapped=pixels_only)
    self._render_kwargs = render_kwargs or {}
    probe = env.physics.render(**self._render_kwargs)
    self._pixel_spec = specs.Array(
        shape=probe.shape, dtype=probe.dtype, name=observation_key)

  def _extra_spec(self):
    return self._pixel_spec

  def _extra_value(self):
    return self._env.physics.render(**self._render_kwargs)
