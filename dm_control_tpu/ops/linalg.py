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


def cholesky(H: jax.Array) -> jax.Array:
  """Lower-triangular Cholesky factor of a batch of SPD matrices.

  H: (..., n, n) with small static n. Unrolled Cholesky-Crout: column j
  of L is one batched matvec against the already-computed columns.
  """
  n = H.shape[-1]
  if n == 0:
    return H
  if n > _UNROLL_MAX_N:
    return jnp.linalg.cholesky(H)
  dtype = H.dtype
  cols = []
  eps = jnp.asarray(1e-30, dtype)
  for j in range(n):
    hj = H[..., :, j]
    if cols:
      Lpart = jnp.stack(cols, axis=-1)             # (..., n, j)
      rowj = Lpart[..., j, :]                      # (..., j)
      c = hj - jnp.einsum('...ik,...k->...i', Lpart, rowj)
    else:
      c = hj
    djj = jnp.sqrt(jnp.maximum(c[..., j], eps))
    col = c / djj[..., None]
    mask = (np.arange(n) >= j)
    col = jnp.where(jnp.asarray(mask), col, jnp.zeros((), dtype))
    cols.append(col)
  return jnp.stack(cols, axis=-1)


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
  if n > _UNROLL_MAX_N:
    L = jnp.linalg.cholesky(H)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=H.dtype), H.shape)
    K = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    return jnp.swapaxes(K, -1, -2)
  dtype = H.dtype
  eps = jnp.asarray(1e-30, dtype)
  eye = np.eye(n)
  lcols = []    # lcols[j] = (..., n) column j of L
  krows = []    # krows[i] = (..., n) row i of K
  for j in range(n):
    hj = H[..., :, j]
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
  return jnp.stack(krows, axis=-1)


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
