"""Math ops over variation expressions (reference
dm_control/composer/variation/math.py:27-98)."""

from __future__ import annotations

import abc

import numpy as np

from dm_control_tpu.composer.variation import base
from dm_control_tpu.composer.variation.variation_values import evaluate


class MathOp(base.Variation):
  """Applies a numpy callable to evaluated variation arguments.

  Subclasses supply `_callable`; positional and keyword arguments given
  at construction are recursively evaluated (structured values are
  traversed) before the callable is applied.
  """

  def __init__(self, *args, **kwargs):
    self._args = args
    self._kwargs = kwargs

  def __call__(self, initial_value=None, current_value=None,
               random_state=None):
    args = evaluate(self._args, initial_value=initial_value,
                    current_value=current_value,
                    random_state=random_state)
    kwargs = evaluate(self._kwargs, initial_value=initial_value,
                      current_value=current_value,
                      random_state=random_state)
    return self._callable(*args, **kwargs)

  @property
  @abc.abstractmethod
  def _callable(self):
    ...

  def __eq__(self, other):
    return (isinstance(other, type(self))
            and self._args == other._args
            and self._kwargs == other._kwargs)

  def __repr__(self):
    return (f'{type(self).__name__}(args={self._args}, '
            f'kwargs={self._kwargs})')


class Log(MathOp):

  @property
  def _callable(self):
    return np.log


class Max(MathOp):

  @property
  def _callable(self):
    return np.max


class Min(MathOp):

  @property
  def _callable(self):
    return np.min


class Norm(MathOp):

  @property
  def _callable(self):
    return np.linalg.norm
