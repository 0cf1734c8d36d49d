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

    lower = jnp.zeros((NB, BLK, BLK), y_blocks.dtype)
    diag = jnp.zeros((NB, BLK, BLK), y_blocks.dtype)
    upper = jnp.zeros((NB, BLK, BLK), y_blocks.dtype)

    jidx = np.arange(NB)
    for s in range(N_CYTO):
        for c in range(3):
            t = T[s * 3 + c]  # (NB, 10)
            mL = jnp.asarray(((jidx - 1) % 3 == c)[:, None])
            mD = jnp.asarray((jidx % 3 == c)[:, None])
            mU = jnp.asarray(((jidx + 1) % 3 == c)[:, None])
            lower = lower.at[:, :, s].add(jnp.where(mL, t, 0.0))
            diag = diag.at[:, :, s].add(jnp.where(mD, t, 0.0))
            upper = upper.at[:, :, s].add(jnp.where(mU, t, 0.0))

    for ms in range(N_MEMB):
        t = T[3 * N_CYTO + ms]
        # membrane perturbations reach the last interior node (upper
        # coupling of block NB-2) and the membrane block itself.
        upper = upper.at[NB - 2, :, ms].set(t[NB - 2])
        diag = diag.at[NB - 1, :, ms].set(t[NB - 1])

    return lower, diag, upper
