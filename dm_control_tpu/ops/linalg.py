"""Batched small-matrix linear algebra tuned for TPU.

XLA's generic `lax.linalg.cholesky` / `triangular_solve` lower to blocked
While-loop algorithms that are catastrophically slow for the batched tiny
matrices physics needs (nv in [1, 60], batch in the thousands): measured
~15 ms for a (4096, 27, 27) factor on TPU v5e vs ~0.03 ms for the
unrolled formulation below.

Strategy (all empirically tuned on v5e):
  * Unroll the factorization over the (static, small) matrix dimension;
    every step is one fixed-shape batched matvec over the huge batch
    axis, which XLA fuses into a single kernel.
  * Never do sequential substitution solves: compute the explicit
    triangular inverse K = L^-1 during the same unrolled pass, and
    express every solve as two batched matvecs.
  * Materialize stacked outputs along the LAST axis only (stacking along
    axis -2 triggers a pathological layout/scatter in XLA:TPU, ~70x
    slower). We therefore carry K^T (columns = rows of K).

These back `smooth.factor_m`/`solve_m`, the constraint solver's Newton
step, and the implicit-damping Euler integrator (oracle counterparts:
mj_factorM / mj_solveM).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _jacobi_scale(H: jax.Array) -> jax.Array:
  """Diagonal scaling s with diag(s H s) = 1 (van der Sluis optimal).

  Physics mass matrices legitimately span ~6 orders of magnitude on the
  diagonal (a 2 kg arm link vs a 60 g prop's 1e-5 rotational inertia).
  A raw dense Cholesky in f32 loses the small pivots to cancellation
  against the large rows — the scaled factorization keeps every pivot
  O(1), which is what the oracle's f64 sparse tree factorization gets
  for free.
  """
  d = jnp.diagonal(H, axis1=-2, axis2=-1)
  tiny = jnp.asarray(1e-30, H.dtype)
  return jnp.where(d > tiny, jax.lax.rsqrt(jnp.maximum(d, tiny)),
                   jnp.ones((), H.dtype))


def _pivot_floor(dtype) -> float:
  # relative floor for pivots of the UNIT-DIAGONAL scaled matrix: a
  # computed pivot below ~n*eps is pure rounding noise; clamping bounds
  # the factor instead of injecting 1/sqrt(1e-30) garbage rows.
  return 1e-6 if dtype == jnp.float32 else 1e-12


def cholesky(H: jax.Array) -> jax.Array:
  """Lower-triangular Cholesky factor of a batch of SPD matrices.

  H: (..., n, n) with small static n. Unrolled Cholesky-Crout on the
  Jacobi-scaled matrix (unit diagonal): column j of L is one batched
  matvec against the already-computed columns.
  """
  n = H.shape[-1]
  if n == 0:
    return H
  s = _jacobi_scale(H)
  Hs = H * s[..., :, None] * s[..., None, :]
  if n > _UNROLL_MAX_N:
    Ls = jnp.linalg.cholesky(Hs)
  else:
    dtype = H.dtype
    cols = []
    eps = jnp.asarray(_pivot_floor(dtype), dtype)
    for j in range(n):
      hj = Hs[..., :, j]
      if cols:
        Lpart = jnp.stack(cols, axis=-1)           # (..., n, j)
        rowj = Lpart[..., j, :]                    # (..., j)
        c = hj - jnp.einsum('...ik,...k->...i', Lpart, rowj)
      else:
        c = hj
      djj = jnp.sqrt(jnp.maximum(c[..., j], eps))
      col = c / djj[..., None]
      mask = (np.arange(n) >= j)
      col = jnp.where(jnp.asarray(mask), col, jnp.zeros((), dtype))
      cols.append(col)
    Ls = jnp.stack(cols, axis=-1)
  # H = S^-1 (S H S) S^-1  =>  L = S^-1 Ls
  return Ls / s[..., :, None]


# Above this matrix size the unrolled formulation's O(n^2) trace makes
# XLA optimization time explode (humanoid_CMU, nv=62: tens of minutes
# of cold compile); the generic lax Cholesky compiles in O(1) and its
# runtime penalty only affects the per-env (non-batched) path, which
# big models never use for throughput (they run the batched Pallas
# solver).
_UNROLL_MAX_N = 40


def chol_inv_t(H: jax.Array) -> jax.Array:
  """Fused factor-and-invert: returns Kt = (L^-1)^T for SPD H.

  One unrolled pass computes column j of L and row j of K = L^-1
  together; rows of K are stacked along the LAST axis (so the returned
  array is K transposed — see module docstring for why).

  Solve H x = b as x = K^T K b:
      y = einsum('...ji,...j->...i', Kt, b)        # y = K b
      x = einsum('...ij,...j->...i', Kt, y)        # x = K^T y
  (= `kt_solve(Kt, b)` below.)
  """
  n = H.shape[-1]
  if n == 0:
    return H
  s = _jacobi_scale(H)
  Hs = H * s[..., :, None] * s[..., None, :]
  if n > _UNROLL_MAX_N:
    L = jnp.linalg.cholesky(Hs)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=H.dtype), H.shape)
    K = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    # fold the scaling into K: H^-1 = S Ks^T Ks S
    return jnp.swapaxes(K, -1, -2) * s[..., :, None]
  dtype = H.dtype
  eps = jnp.asarray(_pivot_floor(dtype), dtype)
  eye = np.eye(n)
  lcols = []    # lcols[j] = (..., n) column j of L
  krows = []    # krows[i] = (..., n) row i of K
  for j in range(n):
    hj = Hs[..., :, j]
    if lcols:
      Lpart = jnp.stack(lcols, axis=-1)
      rowj = Lpart[..., j, :]
      c = hj - jnp.einsum('...ik,...k->...i', Lpart, rowj)
    else:
      c = hj
    djj = jnp.sqrt(jnp.maximum(c[..., j], eps))
    col = c / djj[..., None]
    col = jnp.where(jnp.asarray(np.arange(n) >= j), col,
                    jnp.zeros((), dtype))
    lcols.append(col)
    # row j of K = (e_j - L[j, :j] @ K[:j, :]) / L[jj]
    acc = jnp.asarray(eye[j], dtype)
    if krows:
      lrow = jnp.stack([lcols[k][..., j] for k in range(j)], axis=-1)
      Kpart = jnp.stack(krows, axis=-1)            # (..., n, j) = K^T so far
      acc = acc - jnp.einsum('...k,...jk->...j', lrow, Kpart)
    krows.append(acc / djj[..., None])
  # Kt[..., j, i] = Ks[i, j]; effective K = Ks S so scale axis -2 by s
  return jnp.stack(krows, axis=-1) * s[..., :, None]


def kt_solve(Kt: jax.Array, b: jax.Array) -> jax.Array:
  """Solve H x = b given Kt = (L^-1)^T from `chol_inv_t`."""
  y = jnp.einsum('...ji,...j->...i', Kt, b)
  return jnp.einsum('...ij,...j->...i', Kt, y)


def solve_psd(H: jax.Array, b: jax.Array) -> jax.Array:
  """Solve H x = b for SPD H (fused factor-invert-solve)."""
  return kt_solve(chol_inv_t(H), b)


def psd_inverse(H: jax.Array) -> jax.Array:
  """Explicit inverse of SPD H: H^-1 = K^T K."""
  Kt = chol_inv_t(H)
  return jnp.einsum('...ik,...jk->...ij', Kt, Kt)
