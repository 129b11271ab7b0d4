"""Random distributions for domain randomization
(reference composer/variation/distributions.py:25-258)."""

from __future__ import annotations

import numpy as np

from dm_control_tpu.composer.variation import base
from dm_control_tpu.composer.variation.variation_values import evaluate


class Distribution(base.Variation):
  """Base: subclasses implement _callable(random_state)(**kwargs)."""

  __slots__ = ('_args', '_kwargs', '_single_sample')

  def __init__(self, *args, single_sample=False, **kwargs):
    self._args = args
    self._kwargs = kwargs
    self._single_sample = single_sample

  def _eval_args(self, initial_value, current_value, random_state):
    args = [evaluate(a, initial_value, current_value, random_state)
            for a in self._args]
    kwargs = {k: evaluate(v, initial_value, current_value, random_state)
              for k, v in self._kwargs.items()}
    return args, kwargs

  def __call__(self, initial_value=None, current_value=None,
               random_state=None):
    args, kwargs = self._eval_args(initial_value, current_value,
                                   random_state)
    size = None
    if not self._single_sample and initial_value is not None:
      shape = np.shape(initial_value)
      size = shape if shape else None
    return self._sample(random_state, *args, size=size, **kwargs)

  def _sample(self, random_state, *args, size=None, **kwargs):
    raise NotImplementedError


class Uniform(Distribution):

  def __init__(self, low=0.0, high=1.0, single_sample=False):
    super().__init__(low, high, single_sample=single_sample)

  def _sample(self, random_state, low, high, size=None):
    return random_state.uniform(low, high, size=size)


class UniformInteger(Distribution):

  def __init__(self, low, high=None, single_sample=False):
    super().__init__(low, high, single_sample=single_sample)

  def _sample(self, random_state, low, high, size=None):
    return random_state.randint(low, high, size=size)


class UniformChoice(Distribution):

  def __init__(self, choices, single_sample=False):
    super().__init__(choices, single_sample=single_sample)

  def _sample(self, random_state, choices, size=None):
    return random_state.choice(choices, size=size)


class UniformPointOnSphere(Distribution):
  """Uniformly distributed unit vector."""

  def __init__(self, single_sample=False):
    super().__init__(single_sample=single_sample)

  def _sample(self, random_state, size=None):
    v = random_state.randn(3)
    return v / np.linalg.norm(v)


class Normal(Distribution):

  def __init__(self, loc=0.0, scale=1.0, single_sample=False):
    super().__init__(loc, scale, single_sample=single_sample)

  def _sample(self, random_state, loc, scale, size=None):
    return random_state.normal(loc, scale, size=size)


class LogNormal(Distribution):

  def __init__(self, mean=0.0, sigma=1.0, single_sample=False):
    super().__init__(mean, sigma, single_sample=single_sample)

  def _sample(self, random_state, mean, sigma, size=None):
    return random_state.lognormal(mean, sigma, size=size)


class Exponential(Distribution):

  def __init__(self, scale=1.0, single_sample=False):
    super().__init__(scale, single_sample=single_sample)

  def _sample(self, random_state, scale, size=None):
    return random_state.exponential(scale, size=size)


class Poisson(Distribution):

  def __init__(self, lam=1.0, single_sample=False):
    super().__init__(lam, single_sample=single_sample)

  def _sample(self, random_state, lam, size=None):
    return random_state.poisson(lam, size=size)


class Bernoulli(Distribution):

  def __init__(self, prob=0.5, single_sample=False):
    super().__init__(prob, single_sample=single_sample)

  def _sample(self, random_state, prob, size=None):
    return random_state.binomial(1, prob, size=size)


class BiasedRandomWalk(base.Variation):
  """Mean-reverting random walk (distributions.py:222-258 parity)."""

  def __init__(self, stdev=0.1, timescale=10.0):
    self._stdev = stdev
    self._timescale = timescale
    self._value = 0.0

  def __call__(self, initial_value=None, current_value=None,
               random_state=None):
    retention = 1.0 - 1.0 / self._timescale
    scale = self._stdev * np.sqrt(1 - retention ** 2)
    self._value = (retention * self._value +
                   random_state.normal(0.0, scale))
    return self._value
