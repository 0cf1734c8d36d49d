"""Batched block-tridiagonal factorization and solve (block Thomas).

The MoL Jacobian of the GAB1-SHP2 system is block-tridiagonal: one
10x10 block per radial node plus one (padded) block for the 8 membrane
ODEs, coupled only to the last interior node (the Robin closure makes
the membrane an extra "node" at the end of the chain).

TPU mapping: a ``lax.scan`` over the ~O(R/dr) blocks whose body is a
batch of small dense factorizations/solves.  Under ``vmap`` over an
ensemble the 10x10 operations become (batch, 10, 10) batched LU/GEMM —
the batch dimension provides the parallelism, which is exactly how the
ensemble workloads (SURVEY.md section 6) use it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gab1_shp2_tpu.ops.smalllu import inv_small


class BTFactors(NamedTuple):
    """Factorization of a block-tridiagonal matrix (lower L, diag D,
    upper U): explicit inverses of the Schur-complement diagonals
    W_i = D_i - L_i G_{i-1} and the propagated upper blocks
    G_i = W_i^{-1} U_i.  Explicit small-block inverses make every
    downstream solve a batched matmul (no LU custom calls, which
    XLA:TPU cannot lower for these shapes)."""

    Winv: jax.Array  # (NB, n, n)
    G: jax.Array     # (NB, n, n)
    L: jax.Array     # (NB, n, n) original lower blocks (needed in solve)


def bt_factor(L: jax.Array, D: jax.Array, U: jax.Array) -> BTFactors:
    """Factor the block-tridiagonal matrix [L_i, D_i, U_i].

    ``L[0]`` and ``U[-1]`` are ignored (no neighbors).  Blocks are
    (NB, n, n).
    """
    n = D.shape[-1]

    def step(G_prev, blocks):
        Li, Di, Ui = blocks
        Wi = Di - Li @ G_prev
        Winv_i = inv_small(Wi)
        Gi = Winv_i @ Ui
        return Gi, (Winv_i, Gi)

    G0 = jnp.zeros((n, n), D.dtype)
    # zero out the unused first lower block so the recursion is uniform
    L = L.at[0].set(jnp.zeros((n, n), D.dtype))
    _, (Winv, G) = jax.lax.scan(step, G0, (L, D, U))
    return BTFactors(Winv=Winv, G=G, L=L)


def bt_solve(fac: BTFactors, b: jax.Array) -> jax.Array:
    """Solve the factored system for RHS ``b`` of shape (NB, n)."""
    n = b.shape[-1]

    def fwd(z_prev, blocks):
        Winv_i, Li, bi = blocks
        zi = Winv_i @ (bi - Li @ z_prev)
        return zi, zi

    z0 = jnp.zeros((n,), b.dtype)
    _, z = jax.lax.scan(fwd, z0, (fac.Winv, fac.L, b))

    def bwd(x_next, blocks):
        Gi, zi = blocks
        xi = zi - Gi @ x_next
        return xi, xi

    xN = jnp.zeros((n,), b.dtype)
    _, x = jax.lax.scan(bwd, xN, (fac.G, z), reverse=True)
    return x


def bt_matvec(L: jax.Array, D: jax.Array, U: jax.Array,
              x: jax.Array) -> jax.Array:
    """Multiply the block-tridiagonal matrix by ``x`` (NB, n) — used in
    tests to validate factorization."""
    y = jnp.einsum("bij,bj->bi", D, x)
    y = y.at[1:].add(jnp.einsum("bij,bj->bi", L[1:], x[:-1]))
    y = y.at[:-1].add(jnp.einsum("bij,bj->bi", U[:-1], x[1:]))
    return y
