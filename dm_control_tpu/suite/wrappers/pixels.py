"""Pixel-observation wrapper (reference suite/wrappers/pixels.py:25-115).

Pixels come from the on-device ray-caster (dm_control_tpu.render), so
`render_kwargs` are forwarded to `rasterizer.render` (height, width,
camera_id, depth, segmentation).
"""

import collections
import collections.abc

import dm_env
from dm_env import specs

STATE_KEY = 'state'


class Wrapper(dm_env.Environment):
  """Wraps a control environment and adds a rendered pixel observation."""

  def __init__(self, env, pixels_only=True, render_kwargs=None,
               observation_key='pixels'):
    if render_kwargs is None:
      render_kwargs = {}

    wrapped_observation_spec = env.observation_spec()
    if isinstance(wrapped_observation_spec, specs.Array):
      self._observation_is_dict = False
      invalid_keys = set([STATE_KEY])
    elif isinstance(wrapped_observation_spec,
                    collections.abc.MutableMapping):
      self._observation_is_dict = True
      invalid_keys = set(wrapped_observation_spec.keys())
    else:
      raise ValueError('Unsupported observation spec structure.')

    if not pixels_only and observation_key in invalid_keys:
      raise ValueError(
          f'Duplicate or reserved observation key {observation_key!r}.')

    if pixels_only:
      self._observation_spec = collections.OrderedDict()
    elif self._observation_is_dict:
      self._observation_spec = wrapped_observation_spec.copy()
    else:
      self._observation_spec = collections.OrderedDict()
      self._observation_spec[STATE_KEY] = wrapped_observation_spec

    pixels = env.render(**render_kwargs)
    self._observation_spec[observation_key] = specs.Array(
        shape=pixels.shape, dtype=pixels.dtype, name=observation_key)

    self._env = env
    self._pixels_only = pixels_only
    self._render_kwargs = render_kwargs
    self._observation_key = observation_key

  def reset(self):
    return self._add_pixel_observation(self._env.reset())

  def step(self, action):
    return self._add_pixel_observation(self._env.step(action))

  def observation_spec(self):
    return self._observation_spec

  def action_spec(self):
    return self._env.action_spec()

  def _add_pixel_observation(self, time_step):
    if self._pixels_only:
      observation = collections.OrderedDict()
    elif self._observation_is_dict:
      observation = type(time_step.observation)(time_step.observation)
    else:
      observation = collections.OrderedDict()
      observation[STATE_KEY] = time_step.observation
    observation[self._observation_key] = self._env.render(
        **self._render_kwargs)
    return time_step._replace(observation=observation)

  def __getattr__(self, name):
    return getattr(self._env, name)
