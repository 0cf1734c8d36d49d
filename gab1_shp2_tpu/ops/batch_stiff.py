"""Batch-aware stiff integrator with lane-minor block linear algebra.

The round-1 production path (``ops/trbdf2.py`` under ``jax.vmap``) is
op-latency bound: with the ensemble axis *leading*, every (10, 10)
Newton block lands in its own (8, 128) TPU vector tile — >90% of each
tile is padding, so the VPU does ~12x the work the math needs, and the
per-step wall-clock at N=256 was ~30 ms (CLAUDE.md round-1 analysis).

This module is the same integrator re-laid-out for the hardware: the
ensemble (lane) axis is the *minor* dimension of every array —

  * state ``y``: (NB, 10, B)        — B lanes fill the 128-wide tiles,
  * Jacobian bands: (NB, 10, 10, B),
  * block matmuls: unrolled j-contractions of fused multiply-adds on
    (NB, 10, 10, B) arrays — tiny matrices never touch the MXU (they
    would be all padding there); the VPU sees full tiles instead,
  * Gauss-Jordan inverses and cyclic reduction identical in structure
    to ``ops/smalllu.py`` / ``ops/cyclic_reduction.py`` but with the
    trailing lane axis.

Per-lane adaptive control (step size, acceptance, failure flags) is
explicit (B,) vectors + ``where`` masks — semantically identical to the
vmapped integrator (same trajectories, same controller arithmetic), so
the two paths cross-validate bit-for-bit up to reduction order.

Reference parity: this is still the QNDF/MoL replacement
(``define_PDESystem_base.jl:268-288``); see ``ops/trbdf2.py`` for the
method-level citations.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gab1_shp2_tpu.models.params import Params
from gab1_shp2_tpu.models.species import CYTO, N_CYTO, N_MEMB
from gab1_shp2_tpu.models.system import Geometry, ReactionDiffusionSystem
from gab1_shp2_tpu.ops import rhs as rhs_mod
from gab1_shp2_tpu.ops.jacobian import (
    BLK,
    _color_seeds,
    fast_block_jacobian_lanes,
)
from gab1_shp2_tpu.ops.rhs import initial_state, kdict
from gab1_shp2_tpu.ops.solution import Solution
from gab1_shp2_tpu.ops.trbdf2 import (
    A,
    GAMMA,
    StiffStats,
    _B1,
    _B2,
    _B3,
    _C_YG,
    _C_YN,
    _ROS_D,
    _ROS_E32,
    _ROW_TABLEAUS,
    _row_step,
)

# ---------------------------------------------------------------------------
# lane-minor small linear algebra
# ---------------------------------------------------------------------------


def mm_lanes(Am: jax.Array, Bm: jax.Array) -> jax.Array:
    """Block matmul ``(..., i, j, B) @ (..., j, k, B) -> (..., i, k, B)``.

    Unrolled over the tiny contraction axis (j <= 10): each term is a
    fused multiply-add on full (…, i, k, B) tiles.  ``dot_general``
    would pad these 10-wide operands onto the MXU; the VPU form is
    ~12x less wasted work.
    """
    j_dim = Am.shape[-2]
    # pure-slice indexing (no int/None mix): int+newaxis subscripts lower
    # to a gather that Mosaic cannot lower when this runs inside the
    # fused Pallas kernel (ops/ros23_pallas.py)
    acc = Am[..., :, 0:1, :] * Bm[..., 0:1, :, :]
    for j in range(1, j_dim):
        acc = acc + Am[..., :, j:j + 1, :] * Bm[..., j:j + 1, :, :]
    return acc


def mv_lanes(Am: jax.Array, x: jax.Array) -> jax.Array:
    """Block matvec ``(..., i, j, B) @ (..., j, B) -> (..., i, B)``."""
    return jnp.sum(Am * x[..., None, :, :], axis=-2)


def eye_lanes(n: int, dtype) -> jax.Array:
    """(n, n, 1) identity built from iota (no constant-array capture, so
    the same code lowers inside Pallas/Mosaic kernels)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    return (r == c).astype(dtype)


def even_odd(a: jax.Array):
    """Stride-2 split along the leading (block) axis, Mosaic-safe.

    Statically unrolled contiguous slices + concatenate: jnp's
    ``a[0::2]`` falls back to gather, ``lax.slice`` with stride 2 hits
    ``vector.extract_strided_slice … strides confined to [1, 2)``, and a
    rank-5 ``reshape + [:, i]`` crashes the TPU backend compiler
    (``Check failed: limits[i] <= dim(i)``) — all measured on v5e.
    The first cyclic-reduction level sees NB padded to the next power
    of two (64 at the production dr=0.2 grid, 128 at dr=0.1), so the
    top-level unroll is 64-128 single-block slices plus one
    concatenate per band — cheap tile copies at run time, but a real
    contributor to trace depth (ops/ros23_pallas.py raises the Python
    recursion limit for exactly this); deeper levels halve the count.
    """
    n0 = a.shape[0]
    ev = [a[i:i + 1] for i in range(0, n0, 2)]
    od = [a[i:i + 1] for i in range(1, n0, 2)]
    ev = ev[0] if len(ev) == 1 else jnp.concatenate(ev, axis=0)
    od = od[0] if len(od) == 1 else jnp.concatenate(od, axis=0)
    return ev, od


def interleave_lanes(e: jax.Array, o: jax.Array) -> jax.Array:
    """Inverse of :func:`even_odd`: ``[e0, o0, e1, o1, …]`` (Mosaic-safe
    unrolled concatenate; see even_odd docstring)."""
    parts = [x for i in range(e.shape[0]) for x in (e[i:i + 1], o[i:i + 1])]
    return jnp.concatenate(parts, axis=0)


def gj_inv_lanes(Am: jax.Array) -> jax.Array:
    """Gauss-Jordan inverse of (..., n, n, B) stacks, lane-minor.

    Pivot-free with clamped pivots, same rationale as
    ``ops/smalllu.py``: the matrices are diagonally dominant Newton/W
    matrices, and a garbage solve surfaces as a rejected step.
    """
    n = Am.shape[-3]
    eye = eye_lanes(n, Am.dtype)
    M = jnp.concatenate(
        [Am, jnp.broadcast_to(eye, Am.shape)], axis=-2)  # (..., n, 2n, B)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    tiny = jnp.asarray(1e-30 if M.dtype == jnp.float64 else 1e-20, M.dtype)
    for k in range(n):
        piv = M[..., k:k + 1, k:k + 1, :]
        piv = jnp.where(jnp.abs(piv) < tiny,
                        jnp.where(piv < 0, -tiny, tiny), piv)
        row_k = M[..., k:k + 1, :, :] / piv
        factors = M[..., :, k:k + 1, :]
        is_k = rows == k
        M = jnp.where(is_k, row_k, M - factors * row_k)
    return M[..., :, n:, :]


# ---------------------------------------------------------------------------
# lane-minor block cyclic reduction (see ops/cyclic_reduction.py)
# ---------------------------------------------------------------------------


class CRLanesLevel(NamedTuple):
    # n_blocks is implied by the shapes (2 * Dinv_odd.shape[0]) so the
    # factors stay a pure-array pytree: they are carried through
    # lax.cond / while_loop by the jac_reuse path, where an int leaf
    # would turn into a tracer
    Dinv_odd: jax.Array
    L_odd: jax.Array
    U_odd: jax.Array
    LDinv: jax.Array
    UDinv: jax.Array


class CRLanesFactors(NamedTuple):
    levels: tuple
    root_inv: jax.Array


def cr_factor_lanes(L: jax.Array, D: jax.Array, U: jax.Array
                    ) -> CRLanesFactors:
    """Factor block-tridiagonal stacks of shape (NB, n, n, B)."""
    nb0, n = D.shape[0], D.shape[1]
    B = D.shape[-1]
    zero_blk = jnp.zeros((1, n, n, B), D.dtype)
    L = jnp.concatenate([zero_blk, L[1:]], axis=0)
    U = jnp.concatenate([U[:-1], zero_blk], axis=0)

    m = 1
    while m < nb0:
        m *= 2
    pad = m - nb0
    if pad:
        eye = jnp.broadcast_to(eye_lanes(n, D.dtype)[None], (pad, n, n, B))
        zpad = jnp.zeros((pad, n, n, B), D.dtype)
        L = jnp.concatenate([L, zpad], axis=0)
        D = jnp.concatenate([D, eye], axis=0)
        U = jnp.concatenate([U, zpad], axis=0)

    nb = m
    levels = []
    while nb > 1:
        De, Do = even_odd(D)
        Le, Lo = even_odd(L)
        Ue, Uo = even_odd(U)
        Dinv_odd = gj_inv_lanes(Do)

        zero1 = jnp.zeros((1, n, n, B), D.dtype)
        if Do.shape[0] > 1:
            Dinv_left = jnp.concatenate([zero1, Dinv_odd[:-1]], axis=0)
            U_left = jnp.concatenate([zero1, Uo[:-1]], axis=0)
            L_left = jnp.concatenate([zero1, Lo[:-1]], axis=0)
            LDinv = mm_lanes(Le, Dinv_left)
            UDinv = mm_lanes(Ue, Dinv_odd)
            D_new = De - mm_lanes(LDinv, U_left) - mm_lanes(UDinv, Lo)
            L_new = -mm_lanes(LDinv, L_left)
            U_new = -mm_lanes(UDinv, Uo)
        else:
            # single odd block: every shifted-left neighbour is exactly
            # zero, so the LDinv/L_new/U_new terms vanish.  Skipping them
            # matters beyond efficiency: mm_lanes with a constant-zero
            # operand crashes the TPU backend compiler inside the fused
            # Pallas kernel (``Check failed: limits[i] <= dim(i)``,
            # measured on v5e), and 0-length concatenate operands are
            # illegal under Mosaic.
            UDinv = mm_lanes(Ue, Dinv_odd)
            LDinv = jnp.zeros_like(UDinv)
            D_new = De - mm_lanes(UDinv, Lo)
            L_new = jnp.zeros_like(D_new)
            U_new = jnp.zeros_like(D_new)

        levels.append(CRLanesLevel(Dinv_odd=Dinv_odd, L_odd=Lo, U_odd=Uo,
                                   LDinv=LDinv, UDinv=UDinv))
        L, D, U = L_new, D_new, U_new
        nb //= 2

    return CRLanesFactors(levels=tuple(levels), root_inv=gj_inv_lanes(D))


def cr_solve_lanes(fac: CRLanesFactors, b: jax.Array) -> jax.Array:
    """Solve for RHS ``b`` of shape (NB, n, B)."""
    nb0, n, B = b.shape
    m = 2 * fac.levels[0].Dinv_odd.shape[0] if fac.levels else 1
    if m > nb0:
        b = jnp.concatenate(
            [b, jnp.zeros((m - nb0, n, B), b.dtype)], axis=0)

    bs = [b]
    zb = jnp.zeros((1, n, B), b.dtype)
    for lv in fac.levels:
        be, bo = even_odd(b)
        if bo.shape[0] > 1:
            bo_left = jnp.concatenate([zb, bo[:-1]], axis=0)
            b = be - mv_lanes(lv.LDinv, bo_left) - mv_lanes(lv.UDinv, bo)
        else:
            # the LDinv term is exactly zero (see cr_factor_lanes); also
            # avoids a constant-zero mv operand, which crashes the TPU
            # backend compiler under the fused Pallas kernel
            b = be - mv_lanes(lv.UDinv, bo)
        bs.append(b)

    x = mv_lanes(fac.root_inv, b)

    for lv, b_lvl in zip(reversed(fac.levels), reversed(bs[:-1])):
        bo = even_odd(b_lvl)[1]
        x_even = x
        zx = jnp.zeros((1, n, B), b.dtype)
        if x_even.shape[0] > 1:
            x_right = jnp.concatenate([x_even[1:], zx], axis=0)
            rhs_o = (bo - mv_lanes(lv.L_odd, x_even)
                     - mv_lanes(lv.U_odd, x_right))
        else:
            # single even block: x_right is exactly zero (same
            # constant-zero-operand avoidance as in cr_factor_lanes)
            rhs_o = bo - mv_lanes(lv.L_odd, x_even)
        x_odd = mv_lanes(lv.Dinv_odd, rhs_o)
        x = interleave_lanes(x_even, x_odd)

    return x[:nb0]


# ---------------------------------------------------------------------------
# lane-minor MoL right-hand side + Jacobian
# ---------------------------------------------------------------------------


def make_mol_rhs_lanes(system: ReactionDiffusionSystem, R: float, dr: float):
    """Lane-minor MoL RHS: ``f(y (NB, 10, B), params (B,)-batched)``.

    Reuses the declarative lowering of ``ops/rhs.py`` — the bulk rate
    tables broadcast over any trailing dims, and the small
    species-last helpers (``bc_closure``, ``memb_rates``) are fed (B, s)
    transposes of the tiny boundary arrays only.
    """
    Nr = int(round(R / dr))
    r = jnp.arange(Nr + 1) * dr

    def rhs(y: jax.Array, params: Params) -> jax.Array:
        B = y.shape[-1]
        k = kdict(params.k)                      # (B,) scalars
        d_eff = rhs_mod.effective_diffusivities(system, params)  # (B, 10)
        C_int = jnp.moveaxis(y[:-1], 0, 1)       # (10, M, B)
        m_t = y[-1, :N_MEMB, :].T                # (B, 8)
        C_near_t = C_int[:, -1, :].T             # (B, 10)
        C_R = rhs_mod.bc_closure(system, C_near_t, m_t, k, d_eff, dr)
        C_full = jnp.concatenate(
            [C_int[:, :1], C_int, C_R.T[:, None]], axis=1)  # (10, M+2, B)

        um, uc, up = C_full[:, :-2], C_full[:, 1:-1], C_full[:, 2:]
        # cancellation-friendly ordering — see ops/rhs.laplacian
        lap = ((up - uc) - (uc - um)) / dr**2
        if system.geometry is Geometry.SPHERICAL:
            lap = lap + (up - um) / (
                r[1:-1].astype(y.dtype)[None, :, None] * dr)

        dC = d_eff.T[:, None, :] * lap + rhs_mod.bulk_rates(system, C_int, k)
        dm = rhs_mod.memb_rates(system, m_t, C_R, k)      # (B, 8)
        dm_pad = jnp.concatenate(
            [dm.T, jnp.zeros((BLK - N_MEMB, B), y.dtype)], axis=0)
        return jnp.concatenate(
            [jnp.moveaxis(dC, 1, 0), dm_pad[None]], axis=0)

    return rhs, r


def block_jacobian_lanes(rhs_lanes, y: jax.Array):
    """Exact block-tridiagonal Jacobian of the lane-minor RHS.

    Same 38-color JVP scheme as ``ops/jacobian.py`` (see there for the
    coloring proof); tangents broadcast over lanes, assembly is three
    einsums.  Returns (NB, 10, 10, B) bands.
    """
    NB, _, B = y.shape
    seeds = jnp.asarray(_color_seeds(NB, y.dtype))   # (38, NB, 10)

    def jvp_one(v):
        vt = jnp.broadcast_to(v[..., None], y.shape)
        return jax.jvp(rhs_lanes, (y,), (vt,))[1]

    T = jax.vmap(jvp_one)(seeds)                     # (38, NB, 10, B)

    Tn = T[: 3 * N_CYTO].reshape(N_CYTO, 3, NB, BLK, B)
    jidx = np.arange(NB)
    cidx = np.arange(3)
    mL = jnp.asarray((jidx[None, :] - 1) % 3 == cidx[:, None], y.dtype)
    mD = jnp.asarray(jidx[None, :] % 3 == cidx[:, None], y.dtype)
    mU = jnp.asarray((jidx[None, :] + 1) % 3 == cidx[:, None], y.dtype)
    lower = jnp.einsum("scjrb,cj->jrsb", Tn, mL)
    diag = jnp.einsum("scjrb,cj->jrsb", Tn, mD)
    upper = jnp.einsum("scjrb,cj->jrsb", Tn, mU)

    Tm = T[3 * N_CYTO:]                              # (8, NB, 10, B)
    pad = jnp.zeros((BLK - N_MEMB, BLK, B), y.dtype)
    up_edge = jnp.moveaxis(jnp.concatenate([Tm[:, NB - 2], pad]), 0, 1)
    di_edge = jnp.moveaxis(jnp.concatenate([Tm[:, NB - 1], pad]), 0, 1)
    col_memb = jnp.asarray(np.arange(BLK) < N_MEMB, y.dtype)[:, None]
    row_m2 = (jidx == NB - 2).astype(y.dtype)[:, None, None, None]
    row_m1 = (jidx == NB - 1).astype(y.dtype)[:, None, None, None]
    upper = upper * (1.0 - row_m2 * col_memb) + row_m2 * up_edge
    diag = diag * (1.0 - row_m1 * col_memb) + row_m1 * di_edge
    return lower, diag, upper


# ---------------------------------------------------------------------------
# the batched adaptive stepper
# ---------------------------------------------------------------------------


def _lanes_y0(CoT, M, dtype):
    """Lane-minor initial state from per-lane concentration rows.

    ``CoT`` is (5, B); returns y0 of shape (NB, BLK, B)
    (``initial_state`` semantics, basepdesolver.jl:94-97,137-141).
    """
    from gab1_shp2_tpu.models.species import MEMB

    B = CoT.shape[-1]
    C0 = jnp.zeros((N_CYTO, M, B), dtype)
    C0 = C0.at[CYTO["iSFK"]].set(CoT[0][None, :])
    C0 = C0.at[CYTO["GRB2"]].set(CoT[1][None, :])
    C0 = C0.at[CYTO["GAB1"]].set(CoT[2][None, :])
    C0 = C0.at[CYTO["SHP2"]].set(CoT[3][None, :])
    m0v = jnp.zeros((N_MEMB, B), dtype).at[MEMB["mE"]].set(CoT[4])
    pad = jnp.zeros((BLK - N_MEMB, B), dtype)
    return jnp.concatenate(
        [jnp.moveaxis(C0, 1, 0), jnp.concatenate([m0v, pad])[None]], axis=0)


def _solver_ctx(system, R, dr, Nts, rtol, atol, tf_total, dtype,
                linsolve_dtype, method, step_impl, rhs_mixed):
    """Shared per-step machinery of the lane-minor stiff integrator.

    Built (at trace time) by both the chunked leg integrator
    (:func:`_solve_batch_impl`) and the continuation-batched lane-refill
    scheduler (:func:`_solve_refill_impl`), so the two dispatch
    strategies share ONE copy of the step arithmetic — a lane's
    trajectory is controller-identical whichever scheduler runs it
    (all lane ops are elementwise in the lane axis; cross-lane
    reductions only gate *iteration counts*, and frozen lanes never
    change values), so step/acceptance sequences match exactly and
    values agree to float roundoff (XLA fuses differently-shaped
    programs with different FMA associativity — measured <=6e-13
    relative in f64, tests/test_batch_stiff.py::TestRefillScheduler).
    """
    from types import SimpleNamespace

    Nr = int(round(R / dr))
    M = Nr - 1
    NB = M + 1
    f_lanes, r = make_mol_rhs_lanes(system, R, dr)
    f_df32 = None
    if rhs_mixed == "df32":
        # compensated (EFT) double-f32 RHS: matches the f64 RHS to
        # ~3e-14 relative (tests/test_df32.py), unlike the jvp-split
        # scheme's ~1e-7 floor — usable at the north-star rtol 1e-6
        from gab1_shp2_tpu.ops.rhs_df32 import make_mol_rhs_lanes_df32
        f_df32, _ = make_mol_rhs_lanes_df32(system, R, dr)
    dt_save = tf_total / Nts
    eps = 1e-10 * tf_total

    ls_dtype = jnp.dtype(linsolve_dtype) if linsolve_dtype else dtype
    eye_l = jnp.eye(BLK, dtype=ls_dtype)[None, :, :, None]

    def factor(L, D, U):
        return cr_factor_lanes(L.astype(ls_dtype), D.astype(ls_dtype),
                               U.astype(ls_dtype))

    def solve(fac, b):
        return cr_solve_lanes(fac, b.astype(ls_dtype)).astype(dtype)

    def bands(y, p):
        """Jacobian bands in the linear-algebra dtype.

        When the linear solve runs narrower than the state (the
        north-star f64 + f32-linsolve config), the band JVPs run on
        ls_dtype-cast inputs: W is factored in ls_dtype anyway, so the
        extra band precision was being discarded while the JVPs paid
        emulated-f64 VPU arithmetic.  J accuracy only preconditions
        Newton / the W-method; f32's ~1e-7 band error sits below the
        f32 factorization rounding (bf16's ~1e-2 did not — see the
        dead-end note in CLAUDE.md).
        """
        if ls_dtype != dtype:
            y = y.astype(ls_dtype)
            p = Params(D=p.D.astype(ls_dtype), k=p.k.astype(ls_dtype))
        L, D_, U = fast_block_jacobian_lanes(system, y, p, r, dr)
        return (L.astype(ls_dtype), D_.astype(ls_dtype),
                U.astype(ls_dtype))

    ntol = 0.03
    newton_iters = 6

    def snapshot(y, p: Params):
        """(10, Nr+1, B) full profile + (8, B) membrane state."""
        k = kdict(p.k)
        d_eff = rhs_mod.effective_diffusivities(system, p)
        C_int = jnp.moveaxis(y[:-1], 0, 1)
        m_t = y[-1, :N_MEMB, :].T
        C_R = rhs_mod.bc_closure(system, C_int[:, -1, :].T, m_t, k, d_eff,
                                 dr)
        C_full = jnp.concatenate(
            [C_int[:, :1], C_int, C_R.T[:, None]], axis=1)
        return C_full, y[-1, :N_MEMB, :]

    slot_ids = jnp.arange(Nts + 1, dtype=jnp.int32)

    def scaled_norm(v, y_a, y_b):
        """Per-lane weighted RMS norm: (NB, 10, B) -> (B,)."""
        w = atol + rtol * jnp.maximum(jnp.abs(y_a), jnp.abs(y_b))
        return jnp.sqrt(jnp.mean((v / w) ** 2, axis=(0, 1)))

    def make_f(p: Params):
        """The lane-batched RHS closed over (possibly carried) params."""
        if rhs_mixed == "df32":
            return partial(f_df32, params=p)
        if rhs_mixed:
            # Double-single RHS for emulated-f64 states (VERDICT-r3
            # item 2): split y into an exact f32 hi part plus an f32
            # lo remainder, evaluate the RHS and its directional
            # derivative at y_hi in NATIVE f32 (one jax.jvp — the lo
            # correction f'(y_hi)·y_lo restores the bits the hi
            # truncation dropped, and the linear Laplacian/metric terms
            # are corrected exactly), and recombine in f64.  The f32
            # rounding of f(y_hi) itself (~1e-7 relative) is NOT
            # recoverable this way, which caps end-to-end accuracy at
            # ~1e-5 — see the measured dead-end note in
            # solve_stiff_batch's docstring before reaching for this
            # on tight-tolerance configs.
            p32 = Params(D=p.D.astype(jnp.float32),
                         k=p.k.astype(jnp.float32))

            def f(y):
                y_hi = y.astype(jnp.float32)
                y_lo = (y - y_hi.astype(dtype)).astype(jnp.float32)
                f_hi, f_lo = jax.jvp(
                    lambda yy: f_lanes(yy, params=p32), (y_hi,), (y_lo,))
                return f_hi.astype(dtype) + f_lo.astype(dtype)

            return f
        return partial(f_lanes, params=p)

    def newton(f, fac, y_init, rhs_const, h):
        """Per-lane Newton iteration; h is (B,)."""
        B = y_init.shape[-1]

        def nbody(c):
            y, dn, it = c
            Gv = y - A * h * f(y) - rhs_const
            dy = solve(fac, -Gv)
            ynew = y + dy
            dn_new = scaled_norm(dy, ynew, ynew)
            # freeze converged lanes
            upd = dn > ntol
            y = jnp.where(upd, ynew, y)
            dn = jnp.where(upd, dn_new, dn)
            return y, dn, it + 1

        def ncond(c):
            _, dn, it = c
            return jnp.logical_and(it < newton_iters,
                                   jnp.any(dn > ntol))

        y, dn, _ = jax.lax.while_loop(
            ncond, nbody,
            (y_init, jnp.full((B,), jnp.inf, dtype),
             jnp.array(0, jnp.int32)))
        return y, dn <= ntol

    def step(f, p, t1, active, st, jac=None, d_eff=None):
        """One adaptive integrator step for every lane.

        ``st`` is the 9-tuple ``(t, h_carry, y, nts, out_C, out_m,
        nacc, nrej, failed)``; ``active`` masks the lanes allowed to
        advance (inactive lanes keep their state bit-for-bit); ``jac``
        optionally supplies cached Jacobian bands (the TRBDF2
        ``jac_reuse`` path), otherwise bands are rebuilt from ``y``.
        Returns ``(updated st, per-lane step-success flags)``.
        """
        t, h_carry, y, nts, out_C, out_m, nacc, nrej, failed = st
        # step size used this iteration: truncated to the leg end for
        # active lanes, a harmless dummy for finished lanes (their
        # carried h is preserved below — it seeds the next leg,
        # matching the per-lane vmapped semantics)
        h = jnp.where(active, jnp.minimum(h_carry, t1 - t),
                      jnp.asarray(1.0, dtype))

        f_n = f(y)
        if jac is not None:
            Lj, Dj, Uj = jac
        elif step_impl != "pallas":
            # the fused kernel builds bands in-kernel from VMEM
            Lj, Dj, Uj = bands(y, p)
        hb = h[None, None, None, :].astype(ls_dtype)
        hd = h[None, None, :]

        if method == "trbdf2":
            fac = factor(-A * hb * Lj,
                         eye_l - A * hb * Dj.astype(ls_dtype),
                         -A * hb * Uj)
            rc1 = y + A * hd * f_n
            y_g, ok1 = newton(f, fac, y + GAMMA * hd * f_n, rc1, hd)
            f_g = (y_g - rc1) / (A * hd)
            rc2 = _C_YG * y_g - _C_YN * y
            y_1, ok2 = newton(f, fac, y_g, rc2, hd)
            f_1 = (y_1 - rc2) / (A * hd)
            y_hat = y + hd * (_B1 * f_n + _B2 * f_g + _B3 * f_1)
            est = solve(fac, y_1 - y_hat)
            errn = scaled_norm(est, y, y_1)
            ok = jnp.logical_and(ok1, ok2)
        elif method == "rosenbrock23" and step_impl == "pallas":
            from gab1_shp2_tpu.ops.ros23_pallas import ros23_step_fused

            y_1, f_1, est = ros23_step_fused(
                system, y, f_n, h, p.k, d_eff, Nr, dr)
            errn = scaled_norm(est, y, y_1)
            ok = jnp.isfinite(errn)
        elif method == "rosenbrock23":
            d = _ROS_D
            fac = factor(-d * hb * Lj,
                         eye_l - d * hb * Dj.astype(ls_dtype),
                         -d * hb * Uj)
            k1 = solve(fac, f_n)
            f_half = f(y + 0.5 * hd * k1)
            k2 = solve(fac, f_half - k1) + k1
            y_1 = y + hd * k2
            f_1 = f(y_1)
            k3 = solve(fac, f_1 - _ROS_E32 * (k2 - f_half)
                       - 2.0 * (k1 - f_n))
            est = (hd / 6.0) * (k1 - 2.0 * k2 + k3)
            errn = scaled_norm(est, y, y_1)
            ok = jnp.isfinite(errn)
        elif method in _ROW_TABLEAUS:
            y_1, est = _row_step(_ROW_TABLEAUS[method], factor, solve,
                                 f, y, f_n, (hb, hd), Lj, Dj, Uj,
                                 eye_l, ls_dtype)
            errn = scaled_norm(est, y, y_1)
            ok = jnp.isfinite(errn)
            # dense output needs f(y_1); RODAS never evaluates it,
            # so the Hermite save path computes it lazily (only on
            # save-grid crossings — at the production Nts=2 that is
            # ~2 extra RHS per solve instead of one per step)
            f_1 = None
        else:
            raise ValueError(f"unknown method {method!r}")

        accept = jnp.logical_and(jnp.logical_and(ok, errn <= 1.0),
                                 active)

        t_new = jnp.where(accept, t + h, t)
        y_new = jnp.where(accept[None, None, :], y_1, y)

        # MEASURED DEAD END (VERDICT r2 item 8): a PI/Gustafsson
        # controller (fac = 0.9*errn^(-0.7/3)*errp^(0.4/3), Hairer &
        # Wanner II.4) was implemented and benchmarked at the bench
        # config (v5e, B=1024/chunk 256).  It did cut rejections on
        # the f64 north star (424 -> 84) but its damped step growth
        # cost far more accepted steps (f32 ros23 187k -> 261k,
        # 923 -> 746 solves/s; f64 trbdf2 599k -> 784k, 202 -> 166)
        # — this problem's rejection rate is already ~0.07%, so
        # smoothing has nothing to buy back.  The plain asymptotic
        # controller stays.
        # asymptotic controller exponent -1/(q+1) where q is the
        # embedded estimator's order: O(h^3) (so -1/3) for trbdf2 /
        # rosenbrock23 / rodas3, O(h^4) for rodas4
        e_exp = (-1.0 / 4.0 if method == "rodas4" else -1.0 / 3.0)
        fac_ok = jnp.clip(0.9 * errn ** e_exp, 0.2, 4.0)
        fac_rej = jnp.where(ok, jnp.clip(0.9 * errn ** e_exp,
                                         0.1, 0.5), 0.3)
        h_prop = h * jnp.where(accept, fac_ok, fac_rej)
        h_prop = jnp.where(jnp.isfinite(h_prop), h_prop, h * 0.3)
        h_new = jnp.where(active, h_prop, h_carry)
        failed = jnp.logical_or(
            failed, jnp.logical_and(active, h_new < 1e-13 * tf_total))

        # dense-output snapshots: per-lane save slots via masked
        # one-hot writes (scatter-free; cheap at the production
        # Nts=2, linear in Nts otherwise)
        def scond(sc):
            nts_i, _, _ = sc
            return jnp.any(jnp.logical_and(
                jnp.logical_and(accept, nts_i <= Nts),
                nts_i * dt_save <= t_new + eps))

        def sbody(sc):
            nts_i, oC, om = sc
            write = jnp.logical_and(
                jnp.logical_and(accept, nts_i <= Nts),
                nts_i * dt_save <= t_new + eps)
            ts = nts_i.astype(dtype) * dt_save
            th = jnp.where(h > 0, (ts - t) / h, 0.0)
            h00 = 2 * th**3 - 3 * th**2 + 1
            h10 = th**3 - 2 * th**2 + th
            h01 = -2 * th**3 + 3 * th**2
            h11 = th**3 - th**2
            y_s = (h00 * y + (h10 * h) * f_n + h01 * y_1
                   + (h11 * h) * f_end)
            Cs, ms = snapshot(y_s, p)
            onehot = slot_ids[:, None] == nts_i[None, :]  # (Nts+1, B)
            wmask = jnp.logical_and(onehot, write[None, :])
            oC = jnp.where(wmask[:, None, None, :], Cs[None], oC)
            om = jnp.where(wmask[:, None, :], ms[None], om)
            return nts_i + write.astype(jnp.int32), oC, om

        if f_1 is None:
            # RODAS never evaluates f(y_1); the Hermite tangent is
            # computed at most ONCE per step, and only on steps
            # that actually cross a save point (the cond's false
            # branch is free) — not once per crossed point.
            f_end = jax.lax.cond(scond((nts, out_C, out_m)),
                                 lambda: f(y_1),
                                 lambda: jnp.zeros_like(y_1))
        else:
            f_end = f_1
        nts, out_C, out_m = jax.lax.while_loop(
            scond, sbody, (nts, out_C, out_m))

        nacc = nacc + accept.astype(jnp.int32)
        nrej = nrej + jnp.logical_and(active, ~accept).astype(jnp.int32)
        return (t_new, h_new, y_new, nts, out_C, out_m, nacc, nrej,
                failed), ok

    from types import SimpleNamespace

    return SimpleNamespace(
        Nr=Nr, M=M, NB=NB, r=r, eps=eps, dt_save=dt_save,
        ls_dtype=ls_dtype, f_lanes=f_lanes, snapshot=snapshot,
        scaled_norm=scaled_norm, bands=bands, factor=factor, solve=solve,
        make_f=make_f, newton=newton, step=step)


@partial(jax.jit, static_argnames=("system", "R", "dr", "Nts", "max_steps",
                                   "method", "linsolve_dtype", "jac_reuse",
                                   "step_impl", "rhs_mixed"))
def _solve_batch_impl(system, Co, params, legs, R, dr, Nts, rtol, atol,
                      max_steps, h0, method, linsolve_dtype,
                      jac_reuse=False, step_impl="xla", rhs_mixed=False):
    dtype = Co.dtype
    B = params.k.shape[0]
    tf_total = legs[-1][1]
    ctx = _solver_ctx(system, R, dr, Nts, rtol, atol, tf_total, dtype,
                      linsolve_dtype, method, step_impl, rhs_mixed)
    Nr, M, eps = ctx.Nr, ctx.M, ctx.eps

    if Co.ndim == 2:
        # per-lane initial concentrations (initial_state semantics,
        # basepdesolver.jl:94-97,137-141, lane-minor)
        y0 = _lanes_y0(Co.T, M, dtype)
        CoEGFR = Co[:, 4]
    else:
        y0s = initial_state(Co, Nr)
        C0 = jnp.broadcast_to(y0s.C_int[..., None], (N_CYTO, M, B))
        m0v = jnp.broadcast_to(y0s.m[..., None], (N_MEMB, B))
        CoEGFR = jnp.broadcast_to(Co[4], (B,))
        pad = jnp.zeros((BLK - N_MEMB, B), dtype)
        y0 = jnp.concatenate(
            [jnp.moveaxis(C0, 1, 0), jnp.concatenate([m0v, pad])[None]],
            axis=0)

    # Jacobian reuse (TRBDF2 only, opt-in; sound because for a Newton
    # method staleness affects only convergence rate, never the
    # converged solution — the classic QNDF/LSODA economics the
    # reference's solver gets from SciML).  Only the 38-JVP band
    # refresh is amortized (age/Newton-failure/leg-change triggered);
    # the W factorization is rebuilt every step from the cached bands
    # in ls_dtype — it is cheap next to the JVPs (which run in
    # ls_dtype, see bands(); emulated-f64 on TPU when ls is f64), and
    # keeping it fresh lets the standard continuous step controller
    # run unchanged (a deadband variant that also preserved the
    # factorization cost ~50% more steps and lost to this scheme at
    # every dtype).  Since fast_block_jacobian_lanes + ls_dtype-native
    # bands, fresh J beats reuse at every measured config (see the
    # default rationale in solve_stiff_batch).
    reuse = bool(jac_reuse) and method == "trbdf2"
    JAC_MAX_AGE = 20

    out_C = jnp.full((Nts + 1, N_CYTO, Nr + 1, B), jnp.nan, dtype)
    out_m = jnp.full((Nts + 1, N_MEMB, B), jnp.nan, dtype)
    C0f, m0f = ctx.snapshot(y0, legs[0][2])
    out_C = out_C.at[0].set(C0f)
    out_m = out_m.at[0].set(m0f)

    def run_leg(carry_in, t0, t1, p: Params):
        f = ctx.make_f(p)
        if step_impl == "pallas":
            # the fused kernel recomputes the RHS in-kernel from the
            # packed kinetics + per-species diffusivities
            d_eff_leg = rhs_mod.effective_diffusivities(system, p)
        else:
            d_eff_leg = None

        def body(c):
            base, extra = c[:9], c[9:]
            t = base[0]
            active = t < t1 - eps
            jac = None
            if reuse:
                Lj, Dj, Uj, j_age, want_refresh = extra
                need_refresh = jnp.logical_or(want_refresh,
                                              j_age >= JAC_MAX_AGE)
                y = base[2]

                def _refresh(_):
                    return ctx.bands(y, p) + (jnp.int32(0),)

                Lj, Dj, Uj, j_age = jax.lax.cond(
                    need_refresh, _refresh,
                    lambda _: (Lj, Dj, Uj, j_age), None)
                jac = (Lj, Dj, Uj)

            st, ok = ctx.step(f, p, t1, active, base, jac=jac,
                              d_eff=d_eff_leg)
            if reuse:
                # a Newton failure invalidates the (possibly stale) J:
                # refresh before the retry; accepted steps age it
                want_new = jnp.any(jnp.logical_and(active, ~ok))
                return st + (Lj, Dj, Uj, j_age + 1, want_new)
            return st

        def cond(c):
            t, _, _, _, _, _, nacc, nrej, failed = c[:9]
            lane_active = jnp.logical_and(
                t < t1 - eps,
                jnp.logical_and(~failed, nacc + nrej < max_steps))
            return jnp.any(lane_active)

        t, h, y, nts, out_C, out_m, nacc, nrej, failed = carry_in
        t = jnp.maximum(t, t0)
        init = (t, h, y, nts, out_C, out_m, nacc, nrej, failed)
        if reuse:
            # fresh J at leg entry (params changed)
            init = init + ctx.bands(y, p) + (jnp.int32(0),
                                             jnp.array(False))
        out = jax.lax.while_loop(cond, body, init)
        return out[:9]

    carry = (jnp.zeros((B,), dtype), jnp.full((B,), h0, dtype), y0,
             jnp.ones((B,), jnp.int32), out_C, out_m,
             jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
             jnp.zeros((B,), bool))
    for (t0, t1, p) in legs:
        carry = run_leg(carry, t0, t1, p)
    t, h, y, nts, out_C, out_m, nacc, nrej, failed = carry
    failed = jnp.logical_or(failed, nts <= Nts)

    t_save = jnp.linspace(0.0, tf_total, Nts + 1).astype(dtype)
    sol = Solution(C=jnp.moveaxis(out_C, -1, 0), m=jnp.moveaxis(out_m, -1, 0),
                   t=t_save, r=ctx.r.astype(dtype), CoEGFR=CoEGFR)
    stats = StiffStats(n_accepted=nacc, n_rejected=nrej, failed=failed)
    return sol, stats


@partial(jax.jit, static_argnames=("system", "R", "dr", "tf", "Nts",
                                   "max_steps", "method", "linsolve_dtype",
                                   "rhs_mixed", "lanes", "harvest_every",
                                   "extract", "t_prechase"))
def _solve_refill_impl(system, Co_all, params, R, dr, tf, Nts, rtol, atol,
                       max_steps, h0, method, linsolve_dtype, lanes,
                       harvest_every, extract, rhs_mixed=False,
                       t_prechase=None, params2=None):
    """Continuation-batched stiff ensemble solve with lane refill.

    The chunked scheduler (:func:`_solve_batch_impl` driven by the
    ensemble engine) pays a lock-step barrier per chunk: a vmapped
    adaptive integration runs until its slowest lane finishes, so every
    chunk costs its max-step member.  Pilot-fit cost sorting recovers
    ~85% of that waste; this scheduler removes the barrier itself.
    ``lanes`` lanes integrate continuously inside ONE ``while_loop``
    device program; every ``harvest_every`` accepted-step iterations
    (and immediately when no lane can advance) finished lanes are
    harvested — their extracted outputs scattered to the (N, …) result
    buffers at their member index — and refilled with the next queued
    members.  No lane ever idles while work remains, and the whole
    ensemble is one device dispatch (no host round-trips at all; the
    reference's work-stealing analogue is ``Threads.@threads`` dynamic
    scheduling, ``get_param_posteriors.jl:147``).

    Per-lane trajectories are controller-identical to the chunked
    scheduler's (shared :func:`_solver_ctx` step arithmetic; all lane
    ops are elementwise in the lane axis, and cross-lane reductions
    only gate iteration counts of loops whose converged/finished lanes
    are frozen): step counts match exactly and values agree to float
    roundoff, so the two schedulers are interchangeable on results.

    Two-leg pulse-chase solves (``t_prechase``) switch params
    PER-LANE: each lane's effective params and leg-end time follow its
    own ``t`` (``t < t_prechase`` -> leg-1 params, end ``t_prechase``;
    after -> ``params2``, end ``tf``), so staggered refilled lanes each
    cross the boundary on their own clock.  Step sizes truncate to the
    lane's current leg end exactly as the chunked leg integrator's
    per-leg ``while_loop`` does, so trajectories remain
    controller-identical (VERDICT-r4 item 3).
    """
    dtype = Co_all.dtype
    N = params.k.shape[0]
    B = int(lanes)
    K = int(harvest_every)
    ctx = _solver_ctx(system, R, dr, Nts, rtol, atol, tf, dtype,
                      linsolve_dtype, method, "xla", rhs_mixed)
    M, Nr = ctx.M, ctx.Nr
    t_save = jnp.linspace(0.0, tf, Nts + 1).astype(dtype)
    if Co_all.ndim == 1:
        Co_all = jnp.broadcast_to(Co_all, (N, 5))
    h0 = jnp.asarray(h0, dtype)

    def fresh(member):
        """Initial lane state for (possibly clamped) member indices."""
        live = member < N
        midx = jnp.clip(member, 0, N - 1)
        Co_l = Co_all[midx]                                  # (B, 5)
        p_l = Params(D=params.D[midx], k=params.k[midx])
        p2_l = (None if params2 is None else
                Params(D=params2.D[midx], k=params2.k[midx]))
        y0 = _lanes_y0(Co_l.T, M, dtype)
        out_C = jnp.full((Nts + 1, N_CYTO, Nr + 1, B), jnp.nan, dtype)
        out_m = jnp.full((Nts + 1, N_MEMB, B), jnp.nan, dtype)
        C0f, m0f = ctx.snapshot(y0, p_l)
        out_C = out_C.at[0].set(C0f)
        out_m = out_m.at[0].set(m0f)
        z = jnp.zeros((B,), dtype)
        st = (z, jnp.full((B,), h0, dtype), y0,
              jnp.ones((B,), jnp.int32), out_C, out_m,
              jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
              jnp.zeros((B,), bool))
        return live, Co_l, p_l, p2_l, st

    def lanes_sol(out_C, out_m, Co_l):
        """The batched Solution view of the lane buffers (vmapped-
        Solution contract: broadcast t and r, like the engine's
        chunk solver)."""
        return Solution(
            C=jnp.moveaxis(out_C, -1, 0), m=jnp.moveaxis(out_m, -1, 0),
            t=jnp.broadcast_to(t_save, (B, Nts + 1)),
            r=jnp.broadcast_to(ctx.r.astype(dtype), (B, Nr + 1)),
            CoEGFR=Co_l[:, 4])

    def extract_lanes(out_C, out_m, Co_l):
        sol = lanes_sol(out_C, out_m, Co_l)
        return jax.vmap(extract)(sol), sol

    member0 = jnp.arange(B, dtype=jnp.int32)
    live0, Co_l0, p_l0, p2_l0, st0 = fresh(member0)
    vals_shape = jax.eval_shape(
        lambda oc, om, col: extract_lanes(oc, om, col)[0],
        st0[4], st0[5], Co_l0)
    out_all0 = jax.tree_util.tree_map(
        lambda s: jnp.zeros((N,) + s.shape[1:], s.dtype), vals_shape)
    ok_all0 = jnp.zeros((N,), bool)
    steps_all0 = jnp.zeros((N,), jnp.int32)

    def lane_pending(live, st):
        t, _, _, _, _, _, nacc, nrej, failed = st
        return jnp.logical_and(
            live, jnp.logical_and(
                t < tf - ctx.eps,
                jnp.logical_and(~failed, nacc + nrej < max_steps)))

    def body(c):
        (it, n_done, next_ptr, member, live, Co_l, p_l, p2_l, st,
         out_all, ok_all, steps_all) = c
        active = lane_pending(live, st)
        if t_prechase is None:
            p_eff, t1 = p_l, tf
        else:
            # per-lane leg switch: a lane that reached its own
            # t_prechase steps with the chase params toward tf; before
            # that it steps with the pulse params, h truncated to
            # t_prechase (same landing the chunked per-leg while_loops
            # produce, so trajectories stay controller-identical)
            in2 = st[0] >= t_prechase - ctx.eps
            p_eff = Params(D=jnp.where(in2[:, None], p2_l.D, p_l.D),
                           k=jnp.where(in2[:, None], p2_l.k, p_l.k))
            t1 = jnp.where(in2, tf, t_prechase).astype(dtype)
        f = ctx.make_f(p_eff)
        st, _ = ctx.step(f, p_eff, t1, active, st)
        still = lane_pending(live, st)
        finished = jnp.logical_and(live, ~still)
        do_h = jnp.logical_and(
            jnp.any(finished),
            jnp.logical_or(jnp.equal(jnp.mod(it, K), K - 1),
                           ~jnp.any(still)))

        def harvest(op):
            (n_done, next_ptr, member, live, Co_l, p_l, p2_l, st,
             out_all, ok_all, steps_all) = op
            t, h, y, nts, out_C, out_m, nacc, nrej, failed = st
            vals, sol = extract_lanes(out_C, out_m, Co_l)
            # incomplete saves count as failure (chunked-path
            # semantics: failed |= nts <= Nts at solve end)
            failed_h = jnp.logical_or(failed, nts <= Nts)
            okl = jnp.logical_and(
                ~failed_h,
                jnp.isfinite(sol.C[:, -1]).all(axis=(-2, -1)))
            idx = jnp.where(finished, member, N)  # N -> dropped
            out_all = jax.tree_util.tree_map(
                lambda buf, v: buf.at[idx].set(v.astype(buf.dtype),
                                               mode="drop"),
                out_all, vals)
            ok_all = ok_all.at[idx].set(okl, mode="drop")
            steps_all = steps_all.at[idx].set(nacc + nrej, mode="drop")
            nf = jnp.sum(finished, dtype=jnp.int32)
            ranks = jnp.cumsum(finished.astype(jnp.int32),
                               dtype=jnp.int32) - 1
            new_member = jnp.where(finished, next_ptr + ranks, member)
            live2, Co_f, p_f, p2_f, st_f = fresh(new_member)
            sel = finished
            sel_r = sel[:, None]
            Co_l = jnp.where(sel_r, Co_f, Co_l)
            p_l = Params(D=jnp.where(sel_r, p_f.D, p_l.D),
                         k=jnp.where(sel_r, p_f.k, p_l.k))
            if p2_l is not None:
                p2_l = Params(D=jnp.where(sel_r, p2_f.D, p2_l.D),
                              k=jnp.where(sel_r, p2_f.k, p2_l.k))
            st = tuple(
                jnp.where(sel.reshape((1,) * (a.ndim - 1) + (B,)), fa, a)
                for fa, a in zip(st_f, st))
            live = jnp.where(sel, live2, live)
            return (n_done + nf, next_ptr + nf, new_member, live,
                    Co_l, p_l, p2_l, st, out_all, ok_all, steps_all)

        op = (n_done, next_ptr, member, live, Co_l, p_l, p2_l, st,
              out_all, ok_all, steps_all)
        op = jax.lax.cond(do_h, harvest, lambda o: o, op)
        return (it + 1,) + op

    def cond(c):
        return c[1] < N

    carry0 = (jnp.int32(0), jnp.int32(0), jnp.int32(B), member0, live0,
              Co_l0, p_l0, p2_l0, st0, out_all0, ok_all0, steps_all0)
    out = jax.lax.while_loop(cond, body, carry0)
    return out[-3], out[-2], out[-1]


def _norm_rhs_mixed(rhs_mixed):
    """Normalize the rhs_mixed flag to a hashable static value.

    False (native RHS in the state dtype), True (jvp-split double-f32,
    ~1e-7 floor), or ``"df32"`` (compensated EFT double-f32, ~2^-48 —
    see :mod:`gab1_shp2_tpu.ops.rhs_df32`).
    """
    if rhs_mixed == "df32":
        return "df32"
    return bool(rhs_mixed)


def solve_stiff_refill(
    system: ReactionDiffusionSystem,
    Co: jax.Array,
    params: Params,
    *,
    extract: Callable = lambda sol: sol,
    R: float = 10.0,
    dr: float = 0.1,
    tf: float = 5.0,
    Nts: int = 100,
    rtol: float = 1e-6,
    atol: float = 1e-9,
    max_steps: int = 20_000,
    h0: float = 1e-5,
    method: str = "trbdf2",
    linsolve_dtype=None,
    rhs_mixed: Optional[bool] = None,
    lanes: int = 256,
    harvest_every: int = 4,
    t_prechase: Optional[float] = None,
):
    """Lane-refill stiff ensemble solve (see :func:`_solve_refill_impl`).

    ``t_prechase`` enables the two-leg pulse-chase protocol (gefitinib
    wash-in at ``t_prechase``: ``kp -> 0``, matching
    ``solve_stiff_batch``'s legs; reference
    ``gefitinib_pulse_chase.jl:104-106``) with PER-LANE leg switching —
    staggered refilled lanes each cross the boundary on their own
    clock, so pulse-chase ensembles no longer pay the chunk barrier.

    Returns ``(out, ok, steps)``: the per-member extracted pytree with
    leading (N,) axis, a success mask, and per-member step counts.
    ``extract`` must be a *stable* hashable callable (it keys the jit
    cache); the default keeps full :class:`Solution` trajectories —
    pass a reducer to keep 10k-member ensembles in HBM.

    ``harvest_every=4`` measured best on v5e (2048-member posterior,
    f32 rodas4 production config: K=1/2/4/8/16/64 -> 3893/3963/3962/
    3921/3786/3093 solves/s; the harvest cond's false branch is nearly
    free, so frequent refills win until the harvest itself — extract +
    member scatter + lane reseed — shows up at K=1).
    """
    Co = jnp.asarray(Co)
    params = Params(D=params.D.astype(Co.dtype), k=params.k.astype(Co.dtype))
    if params.k.ndim != 2:
        raise ValueError("solve_stiff_refill needs batched params (B, ...)")
    ls = jnp.dtype(linsolve_dtype).name if linsolve_dtype else None
    if rhs_mixed is None:
        rhs_mixed = False
    if rhs_mixed and Co.dtype == jnp.float32:
        raise ValueError("rhs_mixed requires a float64 state")
    params2 = None
    if t_prechase is not None:
        params2 = params.replace(kp=0.0)
        t_prechase = float(t_prechase)
    return _solve_refill_impl(system, Co, params, float(R), float(dr),
                              float(tf), int(Nts), rtol, atol,
                              int(max_steps), float(h0), method, ls,
                              int(lanes), int(harvest_every), extract,
                              rhs_mixed=_norm_rhs_mixed(rhs_mixed),
                              t_prechase=t_prechase, params2=params2)


def solve_stiff_batch(
    system: ReactionDiffusionSystem,
    Co: jax.Array,
    params: Params,
    *,
    R: float = 10.0,
    dr: float = 0.1,
    tf: float = 5.0,
    Nts: int = 100,
    rtol: float = 1e-6,
    atol: float = 1e-9,
    max_steps: int = 20_000,
    h0: float = 1e-5,
    t_prechase: Optional[float] = None,
    return_stats: bool = False,
    method: str = "trbdf2",
    linsolve_dtype=None,
    jac_reuse: Optional[bool] = None,
    step_impl: Optional[str] = None,
    rhs_mixed: Optional[bool] = None,
):
    """Batched stiff MoL solve over a parameter ensemble.

    Drop-in throughput replacement for ``vmap(solve_stiff)``: ``params``
    carries a leading batch axis (B,), ``Co`` is (5,) shared or (B, 5)
    per-lane, and the returned :class:`Solution` / :class:`StiffStats`
    have a leading batch axis.  With ``jac_reuse=False`` (the default)
    the adaptive trajectories match the vmapped path exactly (same
    controller arithmetic); ``jac_reuse=True`` amortizes only the
    38-JVP Jacobian *band* refresh across steps (triggered by band age,
    Newton failure, or a leg change) — the W factorization is rebuilt
    from the cached bands every step and the standard step controller
    is used — so solutions agree to the integration tolerance, not
    bit-for-bit.

    ``method`` selects the stepper: ``"trbdf2"`` (default; matches the
    vmapped ``solve_stiff`` trajectories), ``"rosenbrock23"`` (order-2
    W-method, one factor + 3 solves), ``"rodas3"`` / ``"rodas4"``
    (order-3/4 L-stable stiffly-accurate Rosenbrock, one factor + 4/6
    solves).  ``rodas4`` is the production default upstream (ensemble
    engine, GSA runner, bench): at rtol 1e-4 it takes ~2.7x fewer
    steps than rosenbrock23 for ~2x the per-step solves and lands an
    order of magnitude closer to the true solution — measured 1435 vs
    1050 solves/s f32 and 568 vs 243 solves/s at the f64 rtol-1e-6
    north star (v5e, 2026-08-18, scripts/bench_rodas4.py).
    ``jac_reuse`` applies to trbdf2 only (ROW stage solves need the
    current J for their order; the reuse flag is ignored elsewhere).

    ``rhs_mixed=True`` (f64 states only) evaluates the RHS as a
    jvp-corrected double-f32 split — native-f32 VPU work in place of
    emulated-f64 arithmetic (see run_leg in ``_solve_batch_impl``).
    MEASURED (v5e 2026-08-19, scripts/bench_rhs_mixed.py, N=1024): the
    ~1e-7 relative f32 rounding of the hi evaluation is irreducible in
    this scheme (the jvp fixes only the y-truncation), so at the
    north-star rtol 1e-6 it trades accuracy for speed — 472->590
    solves/s (+25%) but end-to-end err 3.3e-7 -> 1.4e-5, failing the
    <=1e-6 north-star gate; at the GSA rtol 1e-4 recipe it is +6.5%
    (973->1035) with err 9.6e-6 -> 4.1e-5.  Kept opt-in: useful for
    f64-state sweeps that only need rtol>=1e-4 accuracy, NOT for the
    north star (dead-end note, VERDICT-r3 item 2).

    ``rhs_mixed="df32"`` instead evaluates the RHS with compensated
    (error-free-transform) double-f32 arithmetic
    (:mod:`gab1_shp2_tpu.ops.rhs_df32`): ~2^-48 agreement with the f64
    RHS (5e-11 measured on-chip), so it has no jvp-split-style
    accuracy floor and is admissible at the north-star rtol 1e-6
    (parity: tests/test_df32.py::TestDf32StiffPath).  MEASURED DEAD
    END 4 (v5e 2026-08-21, scripts/bench_df32_rhs.py +
    bench_df32_northstar.py): the df32 RHS is 7% SLOWER than the
    emulated-f64 RHS at B=256 (92.6 vs 86.4 us/eval; f64/f32 ratio
    2.92) and the rtol-1e-6 north star ties end-to-end (856 vs 853
    solves/s) — XLA's f64 emulation already costs only ~3x native f32
    on this VPU-bound stencil+polynomial workload, the same as the
    EFT op-count multiplier, so there is no arithmetic headroom left.
    This closes VERDICT-r4 item 6: the f64 north-star floor is the
    emulated-f64 RHS itself, now measured from both sides.
    """
    if jac_reuse is None:
        # Historically defaulted on for f64 TRBDF2 (reuse was a 5.4x
        # win when band JVPs ran through autodiff block_jacobian).
        # Two later changes made fresh-J cheaper than the refresh
        # cond's overhead everywhere measured (v5e, B=256, dr=0.2,
        # rtol 1e-6, 2026-08-17): the structure-aware
        # fast_block_jacobian_lanes (~4x cheaper JVPs) and ls_dtype-
        # native band computation (f64+f32-linsolve: reuse 202.6 vs
        # fresh 230.7 solves/s; full-f64: 32.8 vs 36.0).  Fresh J also
        # needs slightly fewer accepted steps (597k vs 599k).
        jac_reuse = False
    Co = jnp.asarray(Co)
    params = Params(D=params.D.astype(Co.dtype), k=params.k.astype(Co.dtype))
    if params.k.ndim != 2:
        raise ValueError("solve_stiff_batch needs batched params (B, ...)")
    if t_prechase is None:
        legs = ((0.0, float(tf), params),)
    else:
        p2 = params.replace(kp=0.0)
        legs = ((0.0, float(t_prechase), params),
                (float(t_prechase), float(tf), p2))
    ls = jnp.dtype(linsolve_dtype).name if linsolve_dtype else None
    if rhs_mixed is None:
        rhs_mixed = False
    if rhs_mixed and Co.dtype == jnp.float32:
        raise ValueError("rhs_mixed splits a wide state into an f32 "
                         "hi/lo pair; it requires a float64 state")
    if step_impl is None:
        # XLA on all platforms.  The fused Pallas step (in-kernel
        # bands + factor + stage solves + RHS, ops/ros23_pallas.py)
        # was hardware-validated 2026-08-18: correct to 5.8e-5 but
        # 906.5 vs 1251.7 solves/s at the f32 headline config — the
        # step is not band-traffic-bound, so the fusion loses to
        # Mosaic's costlier (10,10)-block arithmetic.  See the
        # ros23_pallas module docstring for the measurement.
        step_impl = "xla"
    if step_impl == "pallas" and (Co.dtype != jnp.float32
                                  or ls not in (None, "float32")
                                  or method != "rosenbrock23"):
        raise ValueError("step_impl='pallas' supports only float32 "
                         "rosenbrock23 with float32 linear algebra")
    sol, stats = _solve_batch_impl(system, Co, params, legs, float(R),
                                   float(dr), int(Nts), rtol, atol,
                                   int(max_steps), float(h0), method, ls,
                                   jac_reuse=bool(jac_reuse),
                                   step_impl=step_impl,
                                   rhs_mixed=_norm_rhs_mixed(rhs_mixed))
    if return_stats:
        return sol, stats
    return sol
