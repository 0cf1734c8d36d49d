"""Small dense linear algebra as pure XLA ops.

XLA:TPU has no usable LU custom-call for the tiny (10x10) Newton blocks
of this model (the LuDecompositionExpander pass crashes), and
LAPACK-style factorizations are the wrong shape for the VPU anyway.
These kernels do unrolled Gauss-Jordan elimination with partial
pivoting entirely in elementwise/select ops, batching over arbitrary
leading dimensions — under ``vmap`` over a 10k-member ensemble every
operation is a (batch, 10, ...) vector op, which is exactly what the
TPU wants.  Inverting the blocks explicitly turns all downstream
triangular solves into batched matmuls.
"""

from __future__ import annotations

import jax.numpy as jnp


def gauss_jordan_solve(A: jnp.ndarray, B: jnp.ndarray, *,
                       pivoting: bool = False) -> jnp.ndarray:
    """Solve ``A @ X = B`` for small static n by Gauss-Jordan.

    ``A``: (..., n, n); ``B``: (..., n, m).  The elimination loop is
    unrolled at trace time (n is static and small).

    The default is *pivot-free with clamped pivots*: partial pivoting
    needs argmax + take_along_axis, and those dynamic gathers are
    catastrophically slow on TPU (measured ~200x the cost of the
    surrounding matmuls).  The Newton matrices this kernel factors are
    ``I - a*h*J`` — diagonally dominant for the step sizes an adaptive
    integrator accepts — so diagonal pivots clamped away from zero are
    numerically safe there; a garbage solve from a pathological matrix
    surfaces as a rejected step, not a wrong answer.  Pass
    ``pivoting=True`` for general matrices.
    """
    n = A.shape[-1]
    M = jnp.concatenate([A, B], axis=-1)  # (..., n, n+m)
    rows = jnp.arange(n)
    tiny = jnp.asarray(1e-30 if M.dtype == jnp.float64 else 1e-20, M.dtype)
    for k in range(n):
        is_k = (rows == k)[..., :, None]
        if pivoting:
            col = jnp.abs(M[..., :, k])
            col = jnp.where(rows < k, -jnp.inf, col)  # only rows >= k
            p = jnp.argmax(col, axis=-1)  # (...,)
            pk = p[..., None, None]
            row_k = jnp.take_along_axis(
                M, pk.repeat(M.shape[-1], -1), axis=-2)[..., 0, :]
            is_p = (rows == p[..., None])[..., :, None]
            M = jnp.where(is_k, row_k[..., None, :],
                          jnp.where(is_p, M[..., k:k + 1, :], M))
            piv = M[..., k:k + 1, k:k + 1]
        else:
            piv = M[..., k:k + 1, k:k + 1]
            piv = jnp.where(jnp.abs(piv) < tiny,
                            jnp.where(piv < 0, -tiny, tiny), piv)
        # eliminate column k everywhere except row k
        row_k = M[..., k:k + 1, :] / piv
        factors = M[..., :, k:k + 1]
        M = jnp.where(is_k, row_k, M - factors * row_k)
    return M[..., n:]


def inv_small(A: jnp.ndarray, *, pivoting: bool = False) -> jnp.ndarray:
    """Explicit inverse of small matrices via Gauss-Jordan."""
    n = A.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    return gauss_jordan_solve(A, eye, pivoting=pivoting)
