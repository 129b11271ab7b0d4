"""Pallas TPU kernels for batched small-matrix operations.

The physics hot loop solves thousands of tiny SPD systems per step
(nv x nv with nv in [1, 64], batch in the thousands). Any XLA-level
formulation pays either ~2n sequential kernel launches (unrolled) or
the pathological generic cholesky path. This kernel runs the whole
factor+solve in VMEM in ONE launch, with the batch on the lane axis so
every scalar step of the textbook algorithm is a 128-wide vector op.

Layout contract: matrices arrive TRANSPOSED, (n, n, B), so a scalar
entry A[i, j] is a (B,) vector on the lanes. The wrapper below handles
padding (n -> multiple of 8 sublanes, B -> multiple of the batch tile)
and the two (cheap, XLA-level) transposes.

Used by the batched constraint solver (ops/constraint.py) and the
implicit-damping Euler integrator (ops/forward.py). Non-TPU backends
fall back to the unrolled jnp formulation in ops/linalg.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.ops import linalg

try:
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu
  _HAS_PALLAS = True
except ImportError:   # pragma: no cover
  _HAS_PALLAS = False

_TB = 256   # batch tile (lanes); must be a multiple of 128


def _chol_solve_kernel(n: int, h_ref, g_ref, x_ref, a_scr, y_scr):
  """Solve H x = g for one batch tile; everything stays in VMEM.

  h_ref: (n, n, TB) — H transposed (entry [i, j] is a lane vector)
  g_ref: (n, TB)
  x_ref: (n, TB) output
  a_scr: (n, n, TB) scratch (holds L in the lower triangle)
  y_scr: (n, TB) scratch
  """
  # the wrapper scales H to unit diagonal, so pivots are O(1): a pivot
  # below ~n*eps is rounding noise — clamp instead of dividing by it
  eps = jnp.float32(1e-6)
  a_scr[:] = h_ref[:]
  # (n, 1) row-index iota, generated in-kernel (constants can't be
  # captured by pallas kernels)
  rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

  # ---- in-place right-looking Cholesky (unrolled over columns) ----
  # The rank-1 update slices only the OUTER (row) dim — outer slices
  # are free (untiled), while sublane-dim slices would force masked
  # partial-tile stores. Columns <= j are masked to zero in the
  # multiplicand instead (full-tile vector ops).
  for j in range(n):
    dj = jax.lax.rsqrt(jnp.maximum(a_scr[j, j, :], eps))    # (TB,)
    col = a_scr[:, j, :] * dj                               # (n, TB)
    col = jnp.where(rows >= j, col, 0.0)
    if j + 1 < n:
      colm = jnp.where(rows > j, col, 0.0)
      # quantize the row-slice start to a multiple of 8: rows in
      # [j8, j] are zero in colm (no-op updates), and only n/8 distinct
      # update shapes reach Mosaic (per-j shapes explode compile time)
      j8 = ((j + 1) // 8) * 8
      rest = colm[j8:]                                      # (n-j8, TB)
      a_scr[j8:, :, :] = (
          a_scr[j8:, :, :] - rest[:, None, :] * colm[None, :, :])
    a_scr[:, j, :] = col

  # ---- forward substitution: y = L^-1 g ----
  y_scr[:] = jnp.zeros_like(y_scr)
  for i in range(n):
    if i:
      s = jnp.sum(a_scr[i, :, :] * y_scr[:], axis=0)
    else:
      s = jnp.zeros_like(g_ref[0, :])
    y_scr[i, :] = (g_ref[i, :] - s) / a_scr[i, i, :]

  # ---- back substitution: x = L^-T y ----
  x_ref[:] = jnp.zeros_like(x_ref)
  for i in range(n - 1, -1, -1):
    if i + 1 < n:
      s = jnp.sum(a_scr[i + 1:, i, :] * x_ref[i + 1:, :], axis=0)
    else:
      s = jnp.zeros_like(y_scr[0, :])
    x_ref[i, :] = (y_scr[i, :] - s) / a_scr[i, i, :]


@functools.partial(jax.jit, static_argnames=())
def _chol_solve_tpu(H: jax.Array, g: jax.Array) -> jax.Array:
  """H: (B, n, n) SPD f32, g: (B, n) -> x: (B, n). TPU path."""
  B, n = H.shape[0], H.shape[-1]
  npad = max(8, int(np.ceil(n / 8)) * 8)
  bpad = int(np.ceil(B / _TB)) * _TB
  # Jacobi scaling to unit diagonal (see linalg._jacobi_scale): keeps
  # every pivot O(1) so the f32 factorization survives mass matrices
  # whose diagonal spans ~6 orders of magnitude.
  d = jnp.diagonal(H, axis1=-2, axis2=-1).astype(jnp.float32)
  s = jnp.where(d > 1e-30, jax.lax.rsqrt(jnp.maximum(d, 1e-30)), 1.0)
  H = H.astype(jnp.float32) * s[:, :, None] * s[:, None, :]
  gs = g.astype(jnp.float32) * s
  if n == npad and B == bpad:
    # pre-aligned fast path (the batched constraint solver pads its
    # system once, outside the Newton loop): no pad scatters here
    Hp, gp = H, gs
  else:
    # pad: identity on the extra diagonal keeps the factorization
    # valid; jnp.pad + a constant eye-add stay fusible with the
    # transpose below (a dynamic-update-slice would materialize)
    Hp = jnp.pad(H, ((0, bpad - B), (0, npad - n), (0, npad - n)))
    if npad != n:
      eye_tail = np.zeros((npad, npad), np.float32)
      eye_tail[np.arange(n, npad), np.arange(n, npad)] = 1.0
      Hp = Hp + eye_tail
    gp = jnp.pad(gs, ((0, bpad - B), (0, npad - n)))
  Ht = jnp.transpose(Hp, (1, 2, 0))
  gt = gp.T

  kernel = functools.partial(_chol_solve_kernel, npad)
  xt = pl.pallas_call(
      kernel,
      grid=(bpad // _TB,),
      in_specs=[
          pl.BlockSpec((npad, npad, _TB), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((npad, _TB), lambda i: (0, i),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((npad, _TB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((npad, bpad), jnp.float32),
      scratch_shapes=[
          pltpu.VMEM((npad, npad, _TB), jnp.float32),
          pltpu.VMEM((npad, _TB), jnp.float32),
      ],
  )(Ht, gt)
  return (xt.T[:B, :n] * s).astype(g.dtype)


def chol_solve_batched(H: jax.Array, g: jax.Array) -> jax.Array:
  """Batched SPD solve H x = g; H (B, n, n), g (B, n).

  Pallas kernel on TPU (f32); unrolled-jnp fallback elsewhere and for
  f64 (parity paths run on CPU in float64).
  """
  use_tpu = (_HAS_PALLAS and jax.default_backend() == 'tpu'
             and H.dtype == jnp.float32 and H.shape[-1] > 1)
  if use_tpu:
    return _chol_solve_tpu(H, g)
  return linalg.solve_psd(H, g)
