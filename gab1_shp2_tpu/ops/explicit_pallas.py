"""Pallas TPU kernel: fused explicit ensemble solver (final state).

The explicit reference scheme runs ~1.5e5 tiny FTCS steps
(``basepdesolver.jl:149-296``); as ordinary XLA the per-step launches
dominate.  This kernel keeps the whole ensemble state resident in VMEM
and advances *all* time steps inside one kernel launch: zero HBM
traffic between steps, one dispatch for the entire solve.

It is the TPU-native equivalent of the reference's history-free SA
solver (``sapdesolver.jl:55-280``, the cheap kernel used for the
24,000-solve GSA sweeps): only the final-time state is produced.
Trajectory outputs use the ordinary XLA path (``ops/explicit.py``).

Design notes:
  * layout: bulk state (B, 16, 128) — species on sublanes (10 of 16),
    radial nodes on lanes (Nr+1 of 128); membrane state (B, 8),
  * the reaction terms and the Robin boundary algebra are *reused* from
    the declarative lowering (``ops/rhs.py``) via in-kernel vmap — the
    kernel contributes the memory placement and loop schedule, not a
    second copy of the model,
  * stencil neighbors come from ``pltpu.roll`` (full 128-lane shifts,
    no off-lane layouts); center/boundary/pad lanes are patched with
    lane-index masks,
  * the membrane fixed point runs a fixed ``maxiters`` iterations (the
    reference's tolerance early-exit only changes how many iterations
    converged lanes waste; a fixed count is branch-free and identical
    at the solution),
  * per-member ``dt`` and step counts: lanes whose ``nt_active`` is
    exhausted stop updating, so one kernel serves a whole ensemble of
    different stability limits (cf. ``ops/explicit.py``).

float32 only (TPU VPU); the f64 XLA path remains the precision
reference.
"""

from __future__ import annotations

import math
import sys
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gab1_shp2_tpu.models.params import Params, stability_dt
from gab1_shp2_tpu.models.species import N_CYTO, N_MEMB
from gab1_shp2_tpu.models.system import Geometry, ReactionDiffusionSystem
from gab1_shp2_tpu.ops.rhs import (
    bc_closure,
    bulk_rates,
    effective_diffusivities,
    kdict,
    memb_rates,
)

LANES = 128
SUBL = 16
_FP_TOL = 1e-6  # membrane fixed-point relative tolerance (reference default)

# Mosaic lowering recurses through the kernel jaxpr; the vmapped
# reaction lowering makes it deep enough to hit CPython's default limit
sys.setrecursionlimit(max(sys.getrecursionlimit(), 20_000))


def _step_fn(system, Nr, dr, maxiters):
    """One explicit time step on (B, 16, 128) bulk + (B, 8) membrane."""
    spherical = system.geometry is Geometry.SPHERICAL

    def step(C, m, gCR, gm, k_batch, d_eff, dt):
        # lane masks built in-kernel (captured constants are not
        # allowed as implicit pallas inputs)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANES), 2)
        interior = jnp.logical_and(lane >= 1, lane <= Nr - 1)
        rinv_row = jnp.where(
            lane > 0,
            1.0 / (jnp.maximum(lane, 1).astype(jnp.float32) * dr * dr),
            0.0)  # 1/(r_j * dr) with r_j = j*dr
        # C: (B, 16, 128); m, gCR padded as (B, 16); dt: (B, 1, 1)
        # pltpu.roll requires non-negative shifts: rolling by LANES-1 is
        # the circular equivalent of shift -1 (neighbors at wrapped
        # lanes fall outside the interior mask and are patched anyway)
        up = pltpu.roll(C, jnp.int32(LANES - 1), 2)
        um = pltpu.roll(C, jnp.int32(1), 2)
        lap = (up - 2.0 * C + um) * (1.0 / (dr * dr))
        if spherical:
            lap = lap + (up - um) * rinv_row
        d3 = d_eff[:, :, None]  # (B, 16, 1)

        def member_rates(Cb, kb):
            return bulk_rates(system, Cb[:N_CYTO], kdict(kb))

        rx = jax.vmap(member_rates)(C, k_batch)  # (B, 10, 128)
        rx = jnp.concatenate(
            [rx, jnp.zeros_like(C[:, N_CYTO:, :])], axis=1)
        C_new = C + dt * (d3 * lap + rx)
        # valid only on interior lanes; others patched below
        C_new = jnp.where(interior, C_new, 0.0)
        # r = 0: zero-flux copy of node 1
        C_new = jnp.where(lane == 0, C_new[:, :, 1:2], C_new)

        C_near = C_new[:, :N_CYTO, Nr - 1]  # (B, 10)

        # membrane fixed point, fixed iteration count: the coupling
        # contracts fast at explicit-stability step sizes because the
        # iterate only feeds back through dt-scaled membrane rates
        # (m_new = m_prev + dt*rates(m_prev, bc(mm))).  Measured at
        # x1000-bounds GSA corner draws, mid-transient, with this exact
        # map: warm-started (as here, from the previous step's gCR/gm)
        # 4 iterations reach ~1e-5 relative residual -- the f32 floor;
        # contraction ~0.3x/iteration (see
        # tests/test_utils_and_pallas.py::TestMembraneFixedPointAtCorners).
        # A fixed small count therefore replaces the reference's
        # tolerance loop (basepdesolver.jl:197-242; a data-dependent
        # while_loop here also crashes the Mosaic compiler).  The XLA
        # paths keep exact tolerance semantics.
        def fp(i, carry):
            CR, mm = carry
            CR_new = jax.vmap(
                lambda cn, mi, kb, de: bc_closure(
                    system, cn, mi, kdict(kb), de[:N_CYTO], dr)
            )(C_near, mm, k_batch, d_eff)
            m_new = m + dt[:, 0, :1] * jax.vmap(
                lambda mi, cr, kb: memb_rates(system, mi, cr, kdict(kb))
            )(m, CR_new, k_batch)
            return CR_new, m_new

        CR, m_new = jax.lax.fori_loop(jnp.int32(0), jnp.int32(maxiters),
                                      fp, (gCR, gm))

        CR16 = jnp.concatenate(
            [CR, jnp.zeros((CR.shape[0], SUBL - N_CYTO), CR.dtype)], axis=1)
        C_new = jnp.where(lane == Nr, CR16[:, :, None], C_new)
        return C_new, m_new, CR, m_new

    return step


def _make_kernel(system, Nr, dr, maxiters, n_steps):
    step = _step_fn(system, Nr, dr, maxiters)

    def kernel(C_ref, m_ref, k_ref, d_ref, dt_ref, nt_ref, Cout_ref,
               mout_ref):
        C0 = C_ref[:]          # (B, 16, 128)
        m0 = m_ref[:]          # (B, 8)
        k_batch = k_ref[:]     # (B, 17)
        d_eff = d_ref[:]       # (B, 16)
        # dt/nt arrive pre-shaped (B, 1, 1): 1-D kernel operands crash
        # the Mosaic compiler
        dt = dt_ref[:]
        nt = nt_ref[:]

        def body(i, carry):
            C, m, gCR, gm = carry
            Cn, mn, gCRn, gmn = step(C, m, gCR, gm, k_batch, d_eff, dt)
            active = i < nt    # (B, 1, 1) bool
            C = jnp.where(active, Cn, C)
            m = jnp.where(active[:, :, 0], mn, m)
            gCR = jnp.where(active[:, :, 0], gCRn, gCR)
            gm = jnp.where(active[:, :, 0], gmn, gm)
            return C, m, gCR, gm

        B = C0.shape[0]
        init = (C0, m0, jnp.zeros((B, N_CYTO), C0.dtype),
                jnp.zeros((B, N_MEMB), C0.dtype))
        # int32 bounds: with x64 enabled a python-int bound makes the
        # loop index int64, which has no Mosaic lowering
        C, m, _, _ = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_steps),
                                       body, init)
        Cout_ref[:] = C
        mout_ref[:] = m

    return kernel


@partial(jax.jit, static_argnames=("system", "R", "dr", "maxiters",
                                   "n_steps", "interpret"))
def _run_block(system, C0, m0, k_batch, d_eff, dts, nt, R, dr, maxiters,
               n_steps, interpret):
    Nr = int(round(R / dr))
    B = C0.shape[0]
    kernel = _make_kernel(system, Nr, dr, maxiters, n_steps)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, SUBL, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, N_MEMB), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
        interpret=interpret,
    )(C0, m0, k_batch, d_eff, dts, nt)


def solve_explicit_pallas(
    system: ReactionDiffusionSystem,
    Co: jax.Array,
    params: Params,  # batched (B, ...) leaves
    *,
    R: float = 10.0,
    dr: float = 0.2,
    tf: float = 5.0,
    maxiters: int = 4,
    block: int = 128,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Final-state explicit solve of a parameter ensemble in one (or a
    few) fused kernel launches.

    Returns ``(C (B, 10, Nr+1), m (B, 8))`` at t = tf, float32.
    ``interpret`` defaults to True off-TPU (tests on the CPU backend).
    """
    Nr = int(round(R / dr))
    if Nr + 1 > LANES:
        raise ValueError(
            f"grid {Nr + 1} nodes exceeds the {LANES}-lane kernel layout "
            f"(needs dr >= R/{LANES - 1}).  This excludes fine grids "
            f"(dr=0.05 at R=10) and the R=100 length_scales workload — "
            f"use solve_stiff_batch / solve_explicit for those.")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    B = params.k.shape[0]
    f32 = jnp.float32
    Co = jnp.asarray(Co, f32)
    pb = Params(D=params.D.astype(f32), k=params.k.astype(f32))

    dts = stability_dt(pb, dr).astype(f32)                      # (B,)
    nt = jnp.ceil(tf / dts).astype(jnp.int32)                   # (B,)
    n_steps = int(math.ceil(tf / float(jnp.min(dts))))

    d_eff = jax.vmap(lambda p: effective_diffusivities(system, p))(pb)
    d_eff = jnp.concatenate(
        [d_eff, jnp.zeros((B, SUBL - N_CYTO), f32)], axis=1)    # (B, 16)

    lane = np.arange(LANES)
    C0 = np.zeros((B, SUBL, LANES), np.float32)
    init_rows = {0: Co[0], 2: Co[2], 4: Co[1], 7: Co[3]}
    # rows: iSFK=0, GAB1=2, GRB2=4, SHP2=7 (species registry order)
    for row, val in init_rows.items():
        C0[:, row, lane <= Nr] = float(val)
    C0 = jnp.asarray(C0)
    m0 = jnp.zeros((B, N_MEMB), f32).at[:, 0].set(Co[4])

    outs_C, outs_m = [], []
    for s in range(0, B, block):
        e = min(s + block, B)
        pad = block - (e - s)

        def pad_b(a):
            if pad:
                a = jnp.concatenate([a, a[-1:].repeat(pad, 0)], axis=0)
            return a

        Cb, mb = pad_b(C0[s:e]), pad_b(m0[s:e])
        kb, db = pad_b(pb.k[s:e]), pad_b(d_eff[s:e])
        dtb = pad_b(dts[s:e]).reshape(-1, 1, 1)
        ntb = pad_b(nt[s:e]).reshape(-1, 1, 1)
        Cf, mf = _run_block(system, Cb, mb, kb, db, dtb, ntb, float(R),
                            float(dr), int(maxiters), n_steps,
                            bool(interpret))
        outs_C.append(Cf[: e - s])
        outs_m.append(mf[: e - s])
    C_final = jnp.concatenate(outs_C)[:, :N_CYTO, : Nr + 1]
    m_final = jnp.concatenate(outs_m)
    return C_final, m_final
