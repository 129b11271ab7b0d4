"""Observation-noise variations (contract: reference
composer/variation/noises.py). `cumulative` composes onto the live
value; otherwise onto the episode-initial one."""

from dm_control_tpu.composer.variation import _expr


def _perturb(combine, distribution, cumulative, label):
  def run(ctx):
    amount = _expr.resolve(distribution, ctx)
    anchor = ctx.current if cumulative else ctx.initial
    return combine(anchor, amount)
  return _expr.Expr(run, label=label)


def Additive(distribution, cumulative=False):  # noqa: N802
  return _perturb(lambda a, x: a + x, distribution, cumulative, 'additive')


def Multiplicative(distribution, cumulative=False):  # noqa: N802
  return _perturb(lambda a, x: a * x, distribution, cumulative,
                  'multiplicative')
