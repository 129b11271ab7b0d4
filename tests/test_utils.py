"""Tests for rewards and transformations utilities."""

import numpy as np
import pytest

from dm_control_tpu.utils import rewards
from dm_control_tpu.utils import transformations as tr


# ---------------- rewards.tolerance ----------------


def test_tolerance_in_bounds():
  assert float(rewards.tolerance(0.5, bounds=(0, 1))) == 1.0
  assert float(rewards.tolerance(0.0, bounds=(0, 1))) == 1.0
  assert float(rewards.tolerance(2.0, bounds=(0, 1))) == 0.0


def test_tolerance_margin_value():
  # value at exactly margin distance must equal value_at_margin
  for sigmoid in ('gaussian', 'hyperbolic', 'long_tail', 'reciprocal',
                  'cosine', 'linear', 'quadratic', 'tanh_squared'):
    v = float(rewards.tolerance(2.0, bounds=(0, 1), margin=1.0,
                                sigmoid=sigmoid, value_at_margin=0.1))
    np.testing.assert_allclose(v, 0.1, atol=1e-4)  # float32 default


def test_tolerance_vectorized():
  x = np.linspace(-2, 2, 11)
  v = np.asarray(rewards.tolerance(x, bounds=(-.5, .5), margin=1.0))
  assert v.shape == x.shape
  assert (v >= 0).all() and (v <= 1).all()
  assert v[5] == 1.0


def test_tolerance_validation():
  with pytest.raises(ValueError):
    rewards.tolerance(0.0, bounds=(1, 0))
  with pytest.raises(ValueError):
    rewards.tolerance(0.0, margin=-1)
  with pytest.raises(ValueError):
    rewards.tolerance(0.0, margin=1, sigmoid='no_such_sigmoid')


# ---------------- transformations ----------------


def _random_quat(rng):
  q = rng.randn(4)
  return q / np.linalg.norm(q)


def test_quat_roundtrips():
  rng = np.random.RandomState(0)
  for _ in range(10):
    q = _random_quat(rng)
    m = np.asarray(tr.quat_to_rmat(q))
    q2 = np.asarray(tr.mat_to_quat(m))
    assert (np.allclose(q, q2, atol=1e-5) or
            np.allclose(q, -q2, atol=1e-5))
    # orthonormality
    np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-6)


def test_quat_mul_matches_rmat_mul():
  rng = np.random.RandomState(1)
  q1, q2 = _random_quat(rng), _random_quat(rng)
  m = np.asarray(tr.quat_to_rmat(tr.quat_mul(q1, q2)))
  m12 = np.asarray(tr.quat_to_rmat(q1)) @ np.asarray(tr.quat_to_rmat(q2))
  np.testing.assert_allclose(m, m12, atol=1e-6)


def test_quat_rotate():
  rng = np.random.RandomState(2)
  q = _random_quat(rng)
  v = rng.randn(3)
  np.testing.assert_allclose(
      np.asarray(tr.quat_rotate(q, v)),
      np.asarray(tr.quat_to_rmat(q)) @ v, atol=1e-6)


def test_quat_inv():
  rng = np.random.RandomState(3)
  q = rng.randn(4) * 2.0
  ident = np.asarray(tr.quat_mul(q, tr.quat_inv(q)))
  np.testing.assert_allclose(ident, [1, 0, 0, 0], atol=1e-6)


def test_euler_roundtrip():
  rng = np.random.RandomState(4)
  for _ in range(5):
    e = rng.uniform(-1.2, 1.2, 3)
    q = tr.euler_to_quat(e, 'XYZ')
    e2 = np.asarray(tr.quat_to_euler(q, 'XYZ'))
    np.testing.assert_allclose(e, e2, atol=1e-5)


def test_axisangle_roundtrip():
  rng = np.random.RandomState(5)
  aa = rng.randn(3)
  q = tr.axisangle_to_quat(aa)
  aa2 = np.asarray(tr.quat_to_axisangle(q))
  np.testing.assert_allclose(aa, aa2, atol=1e-5)


def test_hmat():
  rng = np.random.RandomState(6)
  pos = rng.randn(3)
  quat = _random_quat(rng)
  h = np.asarray(tr.pos_quat_to_hmat(pos, quat))
  hinv = np.asarray(tr.hmat_inv(h))
  np.testing.assert_allclose(h @ hinv, np.eye(4), atol=1e-6)
  p2, q2 = tr.hmat_to_pos_quat(h)
  np.testing.assert_allclose(np.asarray(p2), pos, atol=1e-6)


def test_quat_dist():
  q = np.array([1.0, 0, 0, 0])
  r = tr.euler_to_quat(np.array([0.3, 0, 0]))
  np.testing.assert_allclose(float(tr.quat_dist(q, r)), 0.3, atol=1e-5)
