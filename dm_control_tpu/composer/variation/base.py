"""Variation base class with operator overloading
(reference composer/variation/base.py:25-171)."""

from __future__ import annotations

import abc
import operator

import numpy as np


class Variation(abc.ABC):
  """A lazily-evaluated random expression."""

  @abc.abstractmethod
  def __call__(self, initial_value=None, current_value=None,
               random_state=None):
    """Evaluates the variation."""

  def __add__(self, other):
    return _BinaryOperation(operator.add, self, other)

  def __radd__(self, other):
    return _BinaryOperation(operator.add, other, self)

  def __sub__(self, other):
    return _BinaryOperation(operator.sub, self, other)

  def __rsub__(self, other):
    return _BinaryOperation(operator.sub, other, self)

  def __mul__(self, other):
    return _BinaryOperation(operator.mul, self, other)

  def __rmul__(self, other):
    return _BinaryOperation(operator.mul, other, self)

  def __truediv__(self, other):
    return _BinaryOperation(operator.truediv, self, other)

  def __rtruediv__(self, other):
    return _BinaryOperation(operator.truediv, other, self)

  def __floordiv__(self, other):
    return _BinaryOperation(operator.floordiv, self, other)

  def __rfloordiv__(self, other):
    return _BinaryOperation(operator.floordiv, other, self)

  def __pow__(self, other):
    return _BinaryOperation(operator.pow, self, other)

  def __neg__(self):
    return _UnaryOperation(operator.neg, self)

  def __getitem__(self, index):
    return _GetItemOperation(self, index)


def _evaluate(value, initial_value, current_value, random_state):
  if isinstance(value, Variation):
    return value(initial_value, current_value, random_state)
  return value


class _BinaryOperation(Variation):

  def __init__(self, op, left, right):
    self._op = op
    self._left = left
    self._right = right

  def __call__(self, initial_value=None, current_value=None,
               random_state=None):
    left = _evaluate(self._left, initial_value, current_value,
                     random_state)
    right = _evaluate(self._right, initial_value, current_value,
                      random_state)
    return self._op(left, right)


class _UnaryOperation(Variation):

  def __init__(self, op, operand):
    self._op = op
    self._operand = operand

  def __call__(self, initial_value=None, current_value=None,
               random_state=None):
    return self._op(_evaluate(self._operand, initial_value,
                              current_value, random_state))


class _GetItemOperation(Variation):

  def __init__(self, variation, index):
    self._variation = variation
    self._index = index

  def __call__(self, initial_value=None, current_value=None,
               random_state=None):
    return np.asarray(_evaluate(
        self._variation, initial_value, current_value,
        random_state))[self._index]
