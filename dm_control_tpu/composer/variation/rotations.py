"""Rotation-valued variations (reference
dm_control/composer/variation/rotations.py:27-146).

All quaternions are wxyz-ordered, matching
`dm_control_tpu.utils.transformations`.
"""

from __future__ import annotations

import numpy as np

from dm_control_tpu.composer.variation import base
from dm_control_tpu.composer.variation.variation_values import evaluate
from dm_control_tpu.utils import transformations

IDENTITY_QUATERNION = np.array([1.0, 0.0, 0.0, 0.0])


class UniformQuaternion(base.Variation):
  """Unit quaternions drawn uniformly from SO(3) (subgroup algorithm)."""

  def __call__(self, initial_value=None, current_value=None,
               random_state=None):
    random_state = random_state or np.random
    u1 = random_state.uniform()
    theta1 = random_state.uniform(0.0, 2.0 * np.pi)
    theta2 = random_state.uniform(0.0, 2.0 * np.pi)
    a, b = np.sqrt(1.0 - u1), np.sqrt(u1)
    return np.array([a * np.sin(theta1), a * np.cos(theta1),
                     b * np.sin(theta2), b * np.cos(theta2)])

  def __eq__(self, other):
    return isinstance(other, UniformQuaternion)

  def __repr__(self):
    return 'UniformQuaternion()'


class QuaternionFromAxisAngle(base.Variation):
  """Builds a quaternion from (possibly varying) axis and angle."""

  def __init__(self, axis, angle):
    self._axis = axis
    self._angle = angle

  def __call__(self, initial_value=None, current_value=None,
               random_state=None):
    axis = np.asarray(evaluate(self._axis, initial_value, current_value,
                               random_state), dtype=float)
    angle = evaluate(self._angle, initial_value, current_value,
                     random_state)
    return transformations.axisangle_to_quat(axis * angle)

  def __eq__(self, other):
    return (isinstance(other, QuaternionFromAxisAngle)
            and self._axis == other._axis
            and self._angle == other._angle)

  def __repr__(self):
    return (f'QuaternionFromAxisAngle(axis={self._axis}, '
            f'angle={self._angle})')


class QuaternionPreMultiply(base.Variation):
  """Pre-multiplies a generated quaternion onto an existing one.

  cumulative=True composes onto the value being varied right now;
  cumulative=False composes onto the episode-initial value.
  """

  def __init__(self, quat, cumulative=False):
    self._quat = quat
    self._cumulative = cumulative

  def __call__(self, initial_value=None, current_value=None,
               random_state=None):
    new = np.asarray(evaluate(self._quat, initial_value, current_value,
                              random_state))
    existing = current_value if self._cumulative else initial_value
    return transformations.quat_mul(new, np.asarray(existing))

  def __eq__(self, other):
    return (isinstance(other, QuaternionPreMultiply)
            and self._quat == other._quat
            and self._cumulative == other._cumulative)

  def __repr__(self):
    return (f'QuaternionPreMultiply(quat={self._quat}, '
            f'cumulative={self._cumulative})')


class QuaternionRotate(base.Variation):
  """Rotates a vector by a quaternion-valued variation.

  When `vec` is omitted the vector to rotate is the bound value itself
  (current value in cumulative mode, initial value otherwise).
  """

  def __init__(self, quat, vec=None, cumulative=False):
    self._quat = quat
    self._vec = vec
    self._cumulative = cumulative

  def __call__(self, initial_value=None, current_value=None,
               random_state=None):
    quat = np.asarray(evaluate(self._quat, initial_value, current_value,
                               random_state))
    if self._vec is None:
      vec = current_value if self._cumulative else initial_value
    else:
      vec = evaluate(self._vec, initial_value, current_value,
                     random_state)
    return transformations.quat_rotate(quat, np.asarray(vec))

  def __eq__(self, other):
    return (isinstance(other, QuaternionRotate)
            and self._quat == other._quat
            and self._vec == other._vec
            and self._cumulative == other._cumulative)

  def __repr__(self):
    return (f'QuaternionRotate(quat={self._quat}, vec={self._vec}, '
            f'cumulative={self._cumulative})')
