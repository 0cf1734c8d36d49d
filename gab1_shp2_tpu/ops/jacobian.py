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

from gab1_shp2_tpu.models.params import Params
from gab1_shp2_tpu.models.species import N_CYTO, N_MEMB
from gab1_shp2_tpu.models.system import Geometry
from gab1_shp2_tpu.ops import rhs as rhs_mod
from gab1_shp2_tpu.ops.rhs import kdict

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


def fast_block_jacobian_lanes(system, y: jax.Array, params: Params,
                              r: jax.Array, dr: float):
    """Exact block-tridiagonal Jacobian, structure-aware.

    Mathematically identical to :func:`block_jacobian_lanes` (the
    38-colored-JVP route) but ~4x cheaper: the diffusion stencil's
    off-diagonal blocks are analytic (diagonal matrices scaled by
    ``d_eff`` and the metric factors), so only the *pointwise* pieces
    are differentiated —

      * 10 JVPs of ``bulk_rates`` (reaction terms only, no stencil),
      * per-lane ``jacfwd`` of the 10-output ``bc_closure`` and the
        8-output ``memb_rates`` at the boundary (18 tangents on (B,)
        points, negligible),

    versus 38 JVPs of the full RHS.  The win is largest for float64
    states where JVPs run in emulated f64 on TPU.
    Cross-validated against the colored-JVP Jacobian to fp roundoff
    (tests/test_batch_stiff.py).
    """
    NB, _, B = y.shape
    M = NB - 1
    dtype = y.dtype
    k = kdict(params.k)                                   # (B,) scalars
    d_eff = rhs_mod.effective_diffusivities(system, params)  # (B, 10)
    C_int = jnp.moveaxis(y[:-1], 0, 1)                    # (10, M, B)
    m_t = y[-1, :N_MEMB, :].T                             # (B, 8)
    C_near_t = C_int[:, -1, :].T                          # (B, 10)

    # --- reaction Jacobian: 10 pointwise JVPs over (M, B) nodes
    def rates_fn(C):
        return rhs_mod.bulk_rates(system, C, k)

    eye10 = jnp.eye(N_CYTO, dtype=dtype)

    def jvp_s(e):
        tangent = jnp.broadcast_to(e[:, None, None], C_int.shape)
        return jax.jvp(rates_fn, (C_int,), (tangent,))[1]  # (10, M, B)

    Jr = jax.vmap(jvp_s)(eye10)                           # (s_in,10,M,B)
    Dreact = jnp.transpose(Jr, (2, 1, 0, 3))              # (M,10,10,B)

    # --- boundary closures: one combined lane-batched function,
    # JVP'd over 18 seeds.  H returns (C_R, dm) with C_R substituted
    # into memb_rates, so its Jacobian delivers the TOTAL derivatives
    # the assembly needs (the dm rows already contain the
    # Jm_cr @ Jcr_* chain-rule products).  Evaluating H on full (B, .)
    # arrays with the seed axis vmapped keeps this a handful of fused
    # kernels — a per-lane vmap(jacfwd) here generated hundreds of
    # tiny (B,)-shaped kernels and dominated the f32 step cost.
    def H(cn, mm):
        C_R = rhs_mod.bc_closure(system, cn, mm, k, d_eff, dr)
        dm = rhs_mod.memb_rates(system, mm, C_R, k)
        return C_R, dm

    n_seed = N_CYTO + N_MEMB
    seeds = jnp.eye(n_seed, dtype=dtype)

    def jvp_b(e):
        t_cn = jnp.broadcast_to(e[None, :N_CYTO], C_near_t.shape)
        t_m = jnp.broadcast_to(e[None, N_CYTO:], m_t.shape)
        return jax.jvp(H, (C_near_t, m_t), (t_cn, t_m))[1]

    Tcr, Tdm = jax.vmap(jvp_b)(seeds)     # (18,B,10), (18,B,8)
    Jcr_cn = jnp.moveaxis(Tcr[:N_CYTO], 0, -1)      # (B,10,10)
    Jcr_m = jnp.moveaxis(Tcr[N_CYTO:], 0, -1)       # (B,10,8)
    dm_dcn_t = jnp.moveaxis(Tdm[:N_CYTO], 0, -1)    # (B,8,10)
    dm_dm_t = jnp.moveaxis(Tdm[N_CYTO:], 0, -1)     # (B,8,8)

    # --- stencil coefficients (laplacian(); basepdesolver.jl:151)
    rj = r[1:-1].astype(dtype)                            # (M,)
    inv2 = 1.0 / dr**2
    if system.geometry is Geometry.SPHERICAL:
        met = 1.0 / (rj * dr)
    else:
        met = jnp.zeros_like(rj)
    c_m = inv2 - met                                      # coeff of u_{j-1}
    c_p = inv2 + met                                      # coeff of u_{j+1}
    de_l = d_eff.T                                        # (10, B)

    eye_b = eye10[None, :, :, None]                       # (1,10,10,1)
    # interior diagonal: reactions + stencil center
    diag_int = Dreact + eye_b * (-2.0 * inv2) * de_l[None, :, None, :]
    # node 0: the r=0 ghost copies node 0, folding c_m into the center
    diag_int = diag_int.at[0].add(eye10[:, :, None]
                                  * (c_m[0] * de_l)[:, None, :])
    # node M-1: u_{j+1} is the eliminated C_R(C_near=node M-1, m)
    Jcr_cn_l = jnp.moveaxis(Jcr_cn, 0, -1)                # (10,10,B)
    diag_int = diag_int.at[M - 1].add(
        (c_p[M - 1] * de_l)[:, None, :] * Jcr_cn_l)

    # membrane block (padded 8 -> 10)
    pad_r = jnp.zeros((BLK - N_MEMB, BLK, B), dtype)
    Jcr_m_l = jnp.moveaxis(Jcr_m, 0, -1)                  # (10,8,B)
    dm_dm = jnp.moveaxis(dm_dm_t, 0, -1)                  # (8,8,B)
    diag_memb = jnp.concatenate(
        [jnp.concatenate(
            [dm_dm, jnp.zeros((N_MEMB, BLK - N_MEMB, B), dtype)], axis=1),
         pad_r], axis=0)
    diag = jnp.concatenate([diag_int, diag_memb[None]], axis=0)

    # lower band: diag stencil blocks for j>=1; membrane row couples to
    # the last interior node through C_R
    low_int = eye_b * (c_m[:, None, None, None] * de_l[None, :, None, :])
    low_int = low_int.at[0].set(0.0)
    dm_dcn = jnp.moveaxis(dm_dcn_t, 0, -1)                # (8,10,B)
    low_memb = jnp.concatenate([dm_dcn, pad_r], axis=0)
    lower = jnp.concatenate([low_int, low_memb[None]], axis=0)

    # upper band: diag stencil blocks for j<=M-2; node M-1 couples to
    # the membrane block through C_R's m-dependence
    up_int = eye_b * (c_p[:, None, None, None] * de_l[None, :, None, :])
    up_last = (c_p[M - 1] * de_l)[:, None, :] * jnp.concatenate(
        [Jcr_m_l, jnp.zeros((BLK, BLK - N_MEMB, B), dtype)], axis=1)
    up_int = up_int.at[M - 1].set(up_last)
    upper = jnp.concatenate(
        [up_int, jnp.zeros((1, BLK, BLK, B), dtype)], axis=0)
    return lower, diag, upper
