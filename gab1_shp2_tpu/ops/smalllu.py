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


def gauss_jordan_solve(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve ``A @ X = B`` for small static n with partial pivoting.

    ``A``: (..., n, n); ``B``: (..., n, m).  The elimination loop is
    unrolled at trace time (n is static and small); pivoting uses
    argmax + gather, so everything stays inside one fused XLA
    computation with no custom calls.
    """
    n = A.shape[-1]
    M = jnp.concatenate([A, B], axis=-1)  # (..., n, n+m)
    rows = jnp.arange(n)
    for k in range(n):
        col = jnp.abs(M[..., :, k])
        col = jnp.where(rows < k, -jnp.inf, col)  # only rows >= k
        p = jnp.argmax(col, axis=-1)  # (...,)
        # swap rows k and p
        pk = p[..., None, None]
        row_k = jnp.take_along_axis(M, pk.repeat(M.shape[-1], -1), axis=-2)
        row_k = row_k[..., 0, :]                      # (..., n+m)
        is_k = (rows == k)[..., :, None]
        is_p = (rows == p[..., None])[..., :, None]
        M = jnp.where(is_k, row_k[..., None, :],
                      jnp.where(is_p, M[..., k:k + 1, :], M))
        # eliminate column k everywhere except row k
        piv = M[..., k:k + 1, k:k + 1]
        row_k = M[..., k:k + 1, :] / piv
        factors = M[..., :, k:k + 1]
        M = jnp.where(is_k, row_k, M - factors * row_k)
    return M[..., n:]


def inv_small(A: jnp.ndarray) -> jnp.ndarray:
    """Explicit inverse of small matrices via Gauss-Jordan."""
    n = A.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    return gauss_jordan_solve(A, eye)
