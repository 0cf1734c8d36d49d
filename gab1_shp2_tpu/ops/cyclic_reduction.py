"""Block cyclic reduction for block-tridiagonal systems.

The block-Thomas sweep (``ops/blocktridiag.py``) runs O(NB) sequential
scan iterations of tiny batched ops — on TPU that is op-latency bound
(each iteration touches only (batch, 10, 10) elements).  Cyclic
reduction restructures the same solve into O(log2 NB) *levels*, each a
single batched operation over half the remaining blocks: ~7 fused
steps instead of ~50-100 for this model's grids, with every step
processing a large contiguous array.  This is the TPU-native shape of
the Newton linear algebra: sequential depth exchanged for batched
width.

The factorization (block inverses + elimination multipliers per level)
is computed once per Newton matrix and reused across all stage/error
solves of a TRBDF2 step.  Python loops over levels unroll at trace
time (NB is static), so the whole factor/solve is one flat XLA graph
with no scans.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gab1_shp2_tpu.ops.smalllu import inv_small


class CRLevel(NamedTuple):
    Dinv_odd: jax.Array  # (n_odd, n, n) inverses of eliminated blocks
    L_odd: jax.Array     # (n_odd, n, n) lower blocks of eliminated rows
    U_odd: jax.Array     # (n_odd, n, n) upper blocks of eliminated rows
    LDinv: jax.Array     # (n_even, n, n) L_even @ Dinv of left neighbor
    UDinv: jax.Array     # (n_even, n, n) U_even @ Dinv of right neighbor
    n_blocks: int        # size of the system entering this level


class CRFactors(NamedTuple):
    levels: Tuple[CRLevel, ...]
    root_inv: jax.Array  # (1, n, n)


def _pad_pow2(L, D, U, n_blocks):
    """Pad with decoupled identity blocks to the next power of two."""
    n = D.shape[-1]
    m = 1
    while m < n_blocks:
        m *= 2
    pad = m - n_blocks
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=D.dtype), (pad, n, n))
        zero = jnp.zeros((pad, n, n), D.dtype)
        L = jnp.concatenate([L, zero], axis=0)
        D = jnp.concatenate([D, eye], axis=0)
        U = jnp.concatenate([U, zero], axis=0)
    return L, D, U, m


def cr_factor(L: jax.Array, D: jax.Array, U: jax.Array) -> CRFactors:
    """Factor the block-tridiagonal matrix [L_i, D_i, U_i] (NB, n, n).

    ``L[0]`` and ``U[-1]`` are ignored.  At each level the odd-indexed
    blocks are eliminated; the reduced (even-indexed) system halves in
    size until one block remains.
    """
    nb0 = D.shape[0]
    n = D.shape[-1]
    L = L.at[0].set(jnp.zeros((n, n), D.dtype))
    U = U.at[-1].set(jnp.zeros((n, n), D.dtype))
    L, D, U, nb = _pad_pow2(L, D, U, nb0)

    levels: List[CRLevel] = []
    while nb > 1:
        De, Do = D[0::2], D[1::2]
        Le, Lo = L[0::2], L[1::2]
        Ue, Uo = U[0::2], U[1::2]
        Dinv_odd = inv_small(Do)

        # even block j couples to odd neighbors j-1 (left) and j+1
        # (right): left neighbor of even m is odd m-1; right is odd m.
        # Stack a zero at the front for m=0's missing left neighbor.
        zero1 = jnp.zeros((1, n, n), D.dtype)
        Dinv_left = jnp.concatenate([zero1, Dinv_odd[:-1]], axis=0)
        U_left = jnp.concatenate([zero1, Uo[:-1]], axis=0)
        L_left = jnp.concatenate([zero1, Lo[:-1]], axis=0)

        LDinv = Le @ Dinv_left          # (n_even, n, n)
        UDinv = Ue @ Dinv_odd

        D_new = De - LDinv @ U_left - UDinv @ Lo
        L_new = -LDinv @ L_left
        U_new = -UDinv @ Uo

        levels.append(CRLevel(Dinv_odd=Dinv_odd, L_odd=Lo, U_odd=Uo,
                              LDinv=LDinv, UDinv=UDinv, n_blocks=nb))
        L, D, U = L_new, D_new, U_new
        nb //= 2

    root_inv = inv_small(D)
    return CRFactors(levels=tuple(levels), root_inv=root_inv)


def cr_solve(fac: CRFactors, b: jax.Array) -> jax.Array:
    """Solve for RHS ``b`` of shape (NB, n) using the factorization."""
    nb0, n = b.shape
    # pad to the power-of-two size of the factorization
    m = fac.levels[0].n_blocks if fac.levels else 1
    if m > nb0:
        b = jnp.concatenate([b, jnp.zeros((m - nb0, n), b.dtype)], axis=0)

    # forward reduction: fold odd entries into even ones
    bs = [b]
    for lv in fac.levels:
        be, bo = b[0::2], b[1::2]
        zb = jnp.zeros((1, n), b.dtype)
        b = be - jnp.einsum("bij,bj->bi", lv.LDinv,
                            jnp.concatenate([zb, bo[:-1]], axis=0)) \
            - jnp.einsum("bij,bj->bi", lv.UDinv, bo)
        bs.append(b)

    # root solve
    x = jnp.einsum("bij,bj->bi", fac.root_inv, b)

    # back substitution: recover odd entries level by level
    for lv, b_lvl in zip(reversed(fac.levels), reversed(bs[:-1])):
        bo = b_lvl[1::2]
        n_even = lv.n_blocks // 2
        x_even = x
        # odd j sits between even j-1 (x_even[m]) and even j+1
        # (x_even[m+1]); the last odd block has no right neighbor.
        zx = jnp.zeros((1, n), b.dtype)
        x_right = jnp.concatenate([x_even[1:], zx], axis=0)
        rhs = bo - jnp.einsum("bij,bj->bi", lv.L_odd, x_even) \
            - jnp.einsum("bij,bj->bi", lv.U_odd, x_right)
        x_odd = jnp.einsum("bij,bj->bi", lv.Dinv_odd, rhs)
        # interleave even/odd back to the level's full size
        x = jnp.stack([x_even, x_odd], axis=1).reshape(lv.n_blocks, n)

    return x[:nb0]
