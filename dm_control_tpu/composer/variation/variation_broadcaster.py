"""Share one sampled variation value across several consumers
(reference dm_control/composer/variation/variation_broadcaster.py:26-65).

The broadcaster hands out proxy Variations. Each round, the first proxy
evaluated draws a fresh sample from the wrapped variation; every other
proxy returns that same sample. A round ends once every live proxy has
consumed the sample exactly once — per-proxy FIFO queues make it safe
for a proxy to fall one round behind without ever seeing a skewed value.
"""

from __future__ import annotations

import collections
import weakref

from dm_control_tpu.composer.variation import base
from dm_control_tpu.composer.variation.variation_values import evaluate


class VariationBroadcaster:
  """Fans a single Variation's samples out to multiple proxies."""

  def __init__(self, wrapped_variation):
    self._wrapped = wrapped_variation
    self._pending = weakref.WeakKeyDictionary()

  def get_proxy(self) -> base.Variation:
    """Returns a Variation that yields the shared per-round sample."""
    proxy = _BroadcastProxy(self)
    self._pending[proxy] = collections.deque()
    return proxy

  def _value_for(self, proxy, random_state):
    queue = self._pending[proxy]
    if not queue:
      sample = evaluate(self._wrapped, None, None, random_state)
      for other_queue in self._pending.values():
        other_queue.append(sample)
    return queue.popleft()


class _BroadcastProxy(base.Variation):

  def __init__(self, broadcaster: VariationBroadcaster):
    self._broadcaster = broadcaster

  def __call__(self, initial_value=None, current_value=None,
               random_state=None):
    return self._broadcaster._value_for(self, random_state)
