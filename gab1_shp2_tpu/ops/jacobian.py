"""Structured MoL Jacobian via graph-colored forward-mode AD.

The MoL right-hand side couples each node only to its two neighbors
(and the last node to the membrane via the Robin closure), so the
Jacobian is block-tridiagonal.  Instead of hand-deriving the 18x18
reaction derivative algebra (what the reference delegates to
ModelingToolkit's symbolic ``jac=true``; ``define_PDESystem_base.jl:268``),
we extract the exact block diagonals with 38 JVPs:

  * 30 "node colors": one seed per (species s, node-index mod 3) —
    nodes of the same color are >= 3 apart, so their +-1-node coupling
    windows never overlap and every Jacobian entry appears in exactly
    one JVP output slot,
  * 8 membrane seeds.

Cost: 38 RHS evaluations per Jacobian vs ~10*(Nr-1)+8 for naive dense
forward-mode, with (NB, 10, 10) block storage instead of a dense matrix
— the difference between fitting a 10k-member ensemble's Newton state in
HBM and not.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gab1_shp2_tpu.models.species import N_CYTO, N_MEMB

BLK = N_CYTO  # block size (membrane block zero-padded from 8 to 10)


def blocks_to_state(y_blocks: jax.Array):
    """(NB, 10) block layout -> (C_int (10, M), m (8,))."""
    C_int = y_blocks[:-1].T
    m = y_blocks[-1, :N_MEMB]
    return C_int, m


def state_to_blocks(C_int: jax.Array, m: jax.Array) -> jax.Array:
    """(C_int (10, M), m (8,)) -> (NB, 10) block layout (membrane padded)."""
    pad = jnp.zeros((BLK - N_MEMB,), m.dtype)
    return jnp.concatenate([C_int.T, jnp.concatenate([m, pad])[None]], axis=0)


def _color_seeds(NB: int, dtype) -> np.ndarray:
    """The 38 JVP seed tangents, shape (38, NB, 10)."""
    seeds = np.zeros((3 * N_CYTO + N_MEMB, NB, BLK), dtype=np.float64)
    j = np.arange(NB - 1)
    for s in range(N_CYTO):
        for c in range(3):
            seeds[s * 3 + c, j[j % 3 == c], s] = 1.0
    for ms in range(N_MEMB):
        seeds[3 * N_CYTO + ms, NB - 1, ms] = 1.0
    return seeds.astype(dtype)


def block_jacobian(rhs_blocks: Callable[[jax.Array], jax.Array],
                   y_blocks: jax.Array
                   ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Exact block-tridiagonal Jacobian (lower, diag, upper) of
    ``rhs_blocks`` at ``y_blocks``.

    ``rhs_blocks``: (NB, 10) -> (NB, 10) with any parameters closed over.
    Returns three (NB, 10, 10) stacks; entry convention
    ``J[row_block i, row s', col_block, col s]`` with lower = coupling to
    block i-1, upper = coupling to block i+1.
    """
    NB = y_blocks.shape[0]
    seeds = jnp.asarray(_color_seeds(NB, y_blocks.dtype))

    def jvp_one(v):
        return jax.jvp(rhs_blocks, (y_blocks,), (v,))[1]

    T = jax.vmap(jvp_one)(seeds)  # (38, NB, 10)

    # node colors: T[s*3+c] holds the response to perturbing all nodes
    # j == c (mod 3) in species s.  Because same-color nodes are >= 3
    # apart, the response at block j attributes uniquely: to the lower
    # coupling if (j-1) % 3 == c, diagonal if j % 3 == c, upper if
    # (j+1) % 3 == c.  One einsum per band replaces the 90 scatter-adds
    # of the per-(s, c) assembly loop (those dominated the per-step op
    # count under vmap).
    Tn = T[: 3 * N_CYTO].reshape(N_CYTO, 3, NB, BLK)
    jidx = np.arange(NB)
    cidx = np.arange(3)
    mL = jnp.asarray((jidx[None, :] - 1) % 3 == cidx[:, None],
                     y_blocks.dtype)  # (3, NB)
    mD = jnp.asarray(jidx[None, :] % 3 == cidx[:, None], y_blocks.dtype)
    mU = jnp.asarray((jidx[None, :] + 1) % 3 == cidx[:, None],
                     y_blocks.dtype)
    lower = jnp.einsum("scjr,cj->jrs", Tn, mL)
    diag = jnp.einsum("scjr,cj->jrs", Tn, mD)
    upper = jnp.einsum("scjr,cj->jrs", Tn, mU)

    # membrane perturbations reach the last interior node (upper
    # coupling of block NB-2) and the membrane block itself.  The node
    # einsum wrote only zeros into these slots (no same-color adjacency
    # at the membrane edge), so a masked set preserves the semantics of
    # the original per-seed .set calls.
    Tm = T[3 * N_CYTO:]  # (8, NB, 10)
    pad = jnp.zeros((BLK - N_MEMB, BLK), y_blocks.dtype)
    up_edge = jnp.concatenate([Tm[:, NB - 2, :], pad]).T  # (10, 10)
    di_edge = jnp.concatenate([Tm[:, NB - 1, :], pad]).T
    col_memb = jnp.asarray(np.arange(BLK) < N_MEMB, y_blocks.dtype)
    row_sel = (jidx == NB - 2).astype(y_blocks.dtype)[:, None, None]
    upper = upper * (1.0 - row_sel * col_memb) + row_sel * up_edge
    row_sel = (jidx == NB - 1).astype(y_blocks.dtype)[:, None, None]
    diag = diag * (1.0 - row_sel * col_memb) + row_sel * di_edge

    return lower, diag, upper
