"""Random-distribution variations (contract: reference
composer/variation/distributions.py).

One table maps each public name to a RandomState sampler; the factory
machinery (parameter resolution, broadcast of the sample size to the
bound value's shape unless `single_sample`) is shared by all of them.
"""

from __future__ import annotations

import numpy as np

from dm_control_tpu.composer.variation import _expr


def _shaped_sampler(draw, label):
  """Factory-of-factories: binds sampler params, handles size logic."""

  def factory(*params, single_sample=False, **kwparams):
    def run(ctx):
      args = [_expr.resolve(p, ctx) for p in params]
      kwargs = {k: _expr.resolve(v, ctx) for k, v in kwparams.items()}
      size = None
      if not single_sample and ctx.initial is not None:
        size = np.shape(ctx.initial) or None
      return draw(ctx.random_state, *args, size=size, **kwargs)
    return _expr.Expr(run, label=label)

  factory.__name__ = label
  return factory


# name -> sampler(random_state, *params, size=None)
_SAMPLERS = {
    'Uniform': lambda rng, low=0.0, high=1.0, size=None:
        rng.uniform(low, high, size=size),
    'UniformInteger': lambda rng, low, high=None, size=None:
        rng.randint(low, high, size=size),
    'UniformChoice': lambda rng, choices, size=None:
        rng.choice(choices, size=size),
    'Normal': lambda rng, loc=0.0, scale=1.0, size=None:
        rng.normal(loc, scale, size=size),
    'LogNormal': lambda rng, mean=0.0, sigma=1.0, size=None:
        rng.lognormal(mean, sigma, size=size),
    'Exponential': lambda rng, scale=1.0, size=None:
        rng.exponential(scale, size=size),
    'Poisson': lambda rng, lam=1.0, size=None:
        rng.poisson(lam, size=size),
    'Bernoulli': lambda rng, prob=0.5, size=None:
        rng.binomial(1, prob, size=size),
    'UniformPointOnSphere': lambda rng, size=None:
        (lambda v: v / np.linalg.norm(v))(rng.randn(3)),
}

globals().update(
    {name: _shaped_sampler(draw, name) for name, draw in _SAMPLERS.items()})


def BiasedRandomWalk(stdev=0.1, timescale=10.0):  # noqa: N802
  """Mean-reverting (OU-like) walk; stationary stdev equals `stdev`."""
  keep = 1.0 - 1.0 / timescale
  step_scale = stdev * np.sqrt(1.0 - keep * keep)

  def make():
    state = [0.0]
    def step(ctx):
      state[0] = keep * state[0] + ctx.random_state.normal(0.0, step_scale)
      return state[0]
    return step

  return _expr.stateful(make, label='biased_walk')


__all__ = list(_SAMPLERS) + ['BiasedRandomWalk']
