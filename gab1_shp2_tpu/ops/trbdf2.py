"""Adaptive TRBDF2 stiff integrator with block-tridiagonal Newton.

The production compute path: replaces the reference's QNDF/MoL solve
(``define_PDESystem_base.jl:268-288``, 1,818 stiff ODEs with a symbolic
Jacobian) with a TPU-first design —

  * one-step L-stable TRBDF2 (TR stage + BDF2 stage sharing the same
    Newton matrix ``W = I - (gamma/2) h J``), third-order embedded error
    estimate filtered through ``W`` (Hosea-Shampine) and a standard
    step-size controller,
  * the Jacobian is the exact block-tridiagonal stack from 38 colored
    JVPs (``ops/jacobian.py``); Newton solves use block cyclic
    reduction (``ops/cyclic_reduction.py``) — O(log NB) batched levels
    instead of a sequential Thomas sweep, the op-latency-friendly shape
    for TPU,
  * everything lives in one ``lax.while_loop`` under jit with static
    shapes, so the whole integrator ``vmap``s over parameter ensembles:
    each lane walks its own adaptive (t, h) trajectory and lanes that
    finish early idle until the batch completes,
  * failures (Newton divergence, dt underflow) set a per-lane flag and
    leave NaN snapshots instead of throwing — vmapped lanes cannot
    throw, so the ensemble layer masks lanes the way the reference
    drops NaN samples (``get_param_posteriors.jl:155``).

Snapshots are taken on the uniform save grid via cubic Hermite dense
output, so large stiff steps are never shortened just to hit save
points.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gab1_shp2_tpu.models.params import Params
from gab1_shp2_tpu.models.species import N_CYTO, N_MEMB
from gab1_shp2_tpu.models.system import ReactionDiffusionSystem
from gab1_shp2_tpu.ops import rhs as rhs_mod
from gab1_shp2_tpu.ops.cyclic_reduction import cr_factor as bt_factor
from gab1_shp2_tpu.ops.cyclic_reduction import cr_solve as bt_solve
from gab1_shp2_tpu.ops.jacobian import (
    block_jacobian,
    fast_block_jacobian_lanes,
    blocks_to_state,
    state_to_blocks,
)
from gab1_shp2_tpu.ops.rhs import MolState, initial_state, kdict
from gab1_shp2_tpu.ops.solution import Solution

GAMMA = 2.0 - math.sqrt(2.0)
A = GAMMA / 2.0  # shared implicit coefficient of both stages
# BDF2-stage combination coefficients
_C_YG = 1.0 / (GAMMA * (2.0 - GAMMA))
_C_YN = (1.0 - GAMMA) ** 2 / (GAMMA * (2.0 - GAMMA))
# third-order embedded weights (order conditions at c = (0, gamma, 1))
_B2 = 1.0 / (6.0 * GAMMA * (1.0 - GAMMA))
_B3 = 0.5 - 1.0 / (6.0 * (1.0 - GAMMA))
_B1 = 1.0 - _B2 - _B3

# Rosenbrock23 (Shampine-Reichelt ode23s) coefficients: a linearly
# implicit W-method — per step one Jacobian+factorization, three RHS
# evaluations, three back-solves, and *no* Newton iteration.  This is
# the TPU-throughput method: the TRBDF2 path's inner Newton while_loops
# cost ~3x the op launches per step for the same order of accuracy.
_ROS_D = 1.0 / (2.0 + math.sqrt(2.0))
_ROS_E32 = 6.0 + math.sqrt(2.0)

# Higher-order Rosenbrock tableaus (transformed Hairer-Wanner form).
#
# Stage i (autonomous system):
#   (I - h*g*J) u_i = h*g*f(y + sum_{j<i} A[i][j] u_j)
#                     + g * sum_{j<i} C[i][j] u_j
#   y1  = y + sum_i M[i] u_i
#   err = sum_i E[i] u_i
#
# This is Hairer & Wanner IV.7 eq. (7.4) multiplied through by h*g, so
# the W matrix is the exact same (I - c*h*J) shape the trbdf2/ros23
# branches already factor with cyclic reduction.  Both tableaus are
# L-stable and stiffly accurate (the last stage argument IS the
# embedded solution), the classic RODAS pairs; coefficients as
# published in Sandu et al. 1997 (RODAS3) and Hairer & Wanner's RODAS
# code (RODAS4).  Tableau order + estimator order were re-verified
# numerically (fixed-step convergence on Van der Pol: slopes 3.0/4.0,
# estimator slopes 3.0/4.0, |R(-1e6)| < 1e-5 both).
#
# Why they earn their place next to rosenbrock23/trbdf2: step count
# scales ~ tol^(-1/(order+1)), and a RODAS step costs only one extra
# back-solve per order gained (factor once, s solves, 3-6 RHS), so at
# the production tolerances the higher-order methods take 2-6x fewer
# steps for nearly the same per-step cost.  The reference's QNDF
# (define_PDESystem_base.jl:288) makes the same trade adaptively
# (variable order 1-5); here the order is per-call config.
_ROW_TABLEAUS = {
    "rodas3": dict(
        g=0.5,
        A=((), (0.0,), (2.0, 0.0), (2.0, 0.0, 1.0)),
        C=((), (4.0,), (1.0, -1.0), (1.0, -1.0, -8.0 / 3.0)),
        M=(2.0, 0.0, 1.0, 1.0),
        E=(0.0, 0.0, 0.0, 1.0),
        est_order=2,
    ),
    "rodas4": dict(
        g=0.25,
        A=((),
           (1.544000000000000,),
           (0.9466785280815826, 0.2557011698983284),
           (3.314825187068521, 2.896124015972201, 0.9986419139977817),
           (1.221224509226641, 6.019134481288629, 12.53708332932087,
            -0.6878860361058950),
           (1.221224509226641, 6.019134481288629, 12.53708332932087,
            -0.6878860361058950, 1.0)),
        C=((),
           (-5.668800000000000,),
           (-2.430093356833875, -0.2063599157091915),
           (-0.1073529058151375, -9.594562251023355, -20.47028614809616),
           (7.496443313967647, -10.24680431464352, -33.99990352819905,
            11.70890893206160),
           (8.083246795921522, -7.981132988064893, -31.52159432874371,
            16.31930543123136, -6.058818238834054)),
        M=(1.221224509226641, 6.019134481288629, 12.53708332932087,
           -0.6878860361058950, 1.0, 1.0),
        E=(0.0, 0.0, 0.0, 0.0, 0.0, 1.0),
        est_order=3,
    ),
}


def _row_step(tab, factor, solve, f, y, f_n, h, Lj, Dj, Uj,
              eye, ls_dtype):
    """One transformed-Rosenbrock (ROW) step shared by the single-lane
    and lane-minor integrators: factor W = I - g*h*J once, then one
    back-solve per stage with trace-time-unrolled coefficient sums.

    ``h`` may be a scalar (single-lane) or broadcastable per-lane array
    pair ``(h_band, h_state)`` — pass the same value twice for the
    scalar case.  Returns ``(y_1, est)``; f(y_1) is intentionally NOT
    computed (RODAS never needs it; dense output evaluates it lazily).
    """
    hb, hd = h
    g = tab["g"]
    fac = factor(-g * hb * Lj, eye - g * hb * Dj.astype(ls_dtype),
                 -g * hb * Uj)
    us = []
    # cache f by the stage-argument coefficient signature: RODAS3's
    # second stage argument is y itself (its A row is all zeros), so
    # its f is the already-computed f_n
    f_cache = {(): f_n}
    for i in range(len(tab["M"])):
        sig = tuple(tab["A"][i])
        while sig and sig[-1] == 0.0:
            sig = sig[:-1]
        if sig not in f_cache:
            arg = y
            for j, a in enumerate(sig):
                if a != 0.0:
                    arg = arg + a * us[j]
            f_cache[sig] = f(arg)
        rhs_i = g * hd * f_cache[sig]
        for j, c in enumerate(tab["C"][i]):
            if c != 0.0:
                rhs_i = rhs_i + (g * c) * us[j]
        us.append(solve(fac, rhs_i))
    y_1 = y
    est = jnp.zeros_like(y)
    for m_i, e_i, u_i in zip(tab["M"], tab["E"], us):
        if m_i != 0.0:
            y_1 = y_1 + m_i * u_i
        if e_i != 0.0:
            est = est + e_i * u_i
    return y_1, est


class StiffStats(NamedTuple):
    n_accepted: jax.Array
    n_rejected: jax.Array
    failed: jax.Array


def _rhs_blocks_fn(system: ReactionDiffusionSystem, R: float, dr: float):
    rhs, r = rhs_mod.make_mol_rhs(system, R, dr)

    def f(y_blocks: jax.Array, params: Params) -> jax.Array:
        C_int, m = blocks_to_state(y_blocks)
        dy = rhs(MolState(C_int=C_int, m=m), params)
        return state_to_blocks(dy.C_int, dy.m)

    return f, r


@partial(jax.jit, static_argnames=("system", "R", "dr", "Nts", "max_steps",
                                   "method", "linsolve_dtype"))
def _solve_stiff_impl(system, Co, params, legs, R, dr, Nts, rtol, atol,
                      max_steps, h0, method, linsolve_dtype):
    dtype = Co.dtype
    Nr = int(round(R / dr))
    M = Nr - 1
    NB = M + 1
    f_blocks, r = _rhs_blocks_fn(system, R, dr)
    tf_total = legs[-1][1]
    dt_save = tf_total / Nts
    eps = 1e-10 * tf_total

    y0_state = initial_state(Co, Nr)
    y0 = state_to_blocks(y0_state.C_int, y0_state.m)

    ls_dtype = jnp.dtype(linsolve_dtype) if linsolve_dtype else dtype
    eye = jnp.eye(N_CYTO, dtype=ls_dtype)[None].repeat(NB, axis=0)

    def factor(L, D, U):
        return bt_factor(L.astype(ls_dtype), D.astype(ls_dtype),
                         U.astype(ls_dtype))

    def solve(fac, b):
        # mixed precision: factor/solve in ls_dtype (f32 on TPU), state
        # and residuals in the trajectory dtype.  For Newton methods the
        # W-solve is a preconditioner, so a low-precision solve affects
        # only the convergence rate, never the solution accuracy.
        return bt_solve(fac, b.astype(ls_dtype)).astype(dtype)

    ntol = 0.03      # Newton tolerance in scaled-error units
    newton_iters = 6

    def snapshot(y_blocks, p: Params):
        C_int, m = blocks_to_state(y_blocks)
        k = kdict(p.k)
        d_eff = rhs_mod.effective_diffusivities(system, p)
        C_full = rhs_mod.full_profile(
            system, MolState(C_int=C_int, m=m), k, d_eff, dr)
        return C_full, m

    nanC = jnp.full((Nts + 1, N_CYTO, Nr + 1), jnp.nan, dtype)
    nanm = jnp.full((Nts + 1, N_MEMB), jnp.nan, dtype)
    C0_full, m0 = snapshot(y0, params)
    out_C = nanC.at[0].set(C0_full)
    out_m = nanm.at[0].set(m0)

    def scaled_norm(v, y_a, y_b):
        w = atol + rtol * jnp.maximum(jnp.abs(y_a), jnp.abs(y_b))
        return jnp.sqrt(jnp.mean((v / w) ** 2))

    def run_leg(carry_in, t0, t1, p: Params):
        f = partial(f_blocks, params=p)

        def newton(fac, y_init, rhs_const, h):
            def nbody(c):
                y, _, it = c
                Gv = y - A * h * f(y) - rhs_const
                dy = solve(fac, -Gv)
                ynew = y + dy
                return ynew, scaled_norm(dy, ynew, ynew), it + 1

            def ncond(c):
                _, dn, it = c
                return jnp.logical_and(it < newton_iters, ~(dn <= ntol))

            y, dn, _ = jax.lax.while_loop(
                ncond, nbody,
                (y_init, jnp.array(jnp.inf, dtype), jnp.array(0, jnp.int32)))
            return y, (dn <= ntol)

        def body(c):
            t, h, y, nts, out_C, out_m, nacc, nrej, failed = c
            h = jnp.minimum(h, t1 - t)

            f_n = f(y)
            # structure-aware Jacobian (see ops/jacobian.py): the
            # lane-minor builder with a unit lane axis; identical to
            # block_jacobian(f, y) to fp roundoff but ~4x cheaper.
            # Computed natively in ls_dtype when the linear solve runs
            # narrower than the state (same rationale + trajectory
            # parity as batch_stiff.bands()).
            if ls_dtype != dtype:
                p1 = Params(D=p.D[None].astype(ls_dtype),
                            k=p.k[None].astype(ls_dtype))
                yj = y[..., None].astype(ls_dtype)
            else:
                p1 = Params(D=p.D[None], k=p.k[None])
                yj = y[..., None]
            Lj, Dj, Uj = (a[..., 0].astype(ls_dtype)
                          for a in fast_block_jacobian_lanes(
                              system, yj, p1, r, dr))

            if method == "trbdf2":
                fac = factor(-A * h * Lj, eye - A * h * Dj.astype(ls_dtype),
                             -A * h * Uj)
                # TR stage to t + gamma*h
                rc1 = y + A * h * f_n
                y_g, ok1 = newton(fac, y + GAMMA * h * f_n, rc1, h)
                f_g = (y_g - rc1) / (A * h)

                # BDF2 stage to t + h
                rc2 = _C_YG * y_g - _C_YN * y
                y_1, ok2 = newton(fac, y_g, rc2, h)
                f_1 = (y_1 - rc2) / (A * h)

                # embedded 3rd-order error estimate, stiffly filtered
                y_hat = y + h * (_B1 * f_n + _B2 * f_g + _B3 * f_1)
                est = solve(fac, y_1 - y_hat)
                errn = scaled_norm(est, y, y_1)
                ok = jnp.logical_and(ok1, ok2)
            elif method == "rosenbrock23":
                d = _ROS_D
                fac = factor(-d * h * Lj, eye - d * h * Dj.astype(ls_dtype),
                             -d * h * Uj)
                k1 = solve(fac, f_n)
                f_half = f(y + 0.5 * h * k1)
                k2 = solve(fac, f_half - k1) + k1
                y_1 = y + h * k2
                f_1 = f(y_1)
                k3 = solve(fac, f_1 - _ROS_E32 * (k2 - f_half)
                              - 2.0 * (k1 - f_n))
                est = (h / 6.0) * (k1 - 2.0 * k2 + k3)
                errn = scaled_norm(est, y, y_1)
                ok = jnp.isfinite(errn)
            elif method in _ROW_TABLEAUS:
                y_1, est = _row_step(_ROW_TABLEAUS[method], factor, solve,
                                     f, y, f_n, (h, h), Lj, Dj, Uj,
                                     eye, ls_dtype)
                errn = scaled_norm(est, y, y_1)
                ok = jnp.isfinite(errn)
                # RODAS never needs f(y_1); the Hermite dense output
                # evaluates it lazily inside the save branch only
                f_1 = None
            else:
                raise ValueError(f"unknown method {method!r}")

            accept = jnp.logical_and(ok, errn <= 1.0)

            t_new = jnp.where(accept, t + h, t)
            y_new = jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, a, b), y_1, y)

            # step-size controller (PI-free, standard asymptotic);
            # exponent -1/(q+1), q = embedded estimator order (3 for
            # trbdf2/ros23/rodas3, 4 for rodas4)
            e_exp = (-1.0 / 4.0 if method == "rodas4" else -1.0 / 3.0)
            fac_ok = jnp.clip(0.9 * errn ** e_exp, 0.2, 4.0)
            fac_rej = jnp.where(ok, jnp.clip(0.9 * errn ** e_exp,
                                             0.1, 0.5), 0.3)
            h_new = h * jnp.where(accept, fac_ok, fac_rej)
            h_new = jnp.where(jnp.isfinite(h_new), h_new, h * 0.3)
            failed = jnp.logical_or(failed, h_new < 1e-13 * tf_total)

            # dense-output snapshots for save points inside (t, t_new]
            def scond(sc):
                nts_i, _, _ = sc
                return jnp.logical_and(nts_i <= Nts,
                                       nts_i * dt_save <= t_new + eps)

            def sbody(sc):
                nts_i, oC, om = sc
                ts = nts_i * dt_save
                th = jnp.where(h > 0, (ts - t) / h, 0.0)
                h00 = 2 * th**3 - 3 * th**2 + 1
                h10 = th**3 - 2 * th**2 + th
                h01 = -2 * th**3 + 3 * th**2
                h11 = th**3 - th**2
                y_s = h00 * y + h10 * h * f_n + h01 * y_1 + h11 * h * f_end
                Cs, ms = snapshot(y_s, p)
                oC = jax.lax.dynamic_update_index_in_dim(oC, Cs, nts_i, 0)
                om = jax.lax.dynamic_update_index_in_dim(om, ms, nts_i, 0)
                return nts_i + 1, oC, om

            if f_1 is None:
                # RODAS never evaluates f(y_1); compute the Hermite
                # tangent at most once per step, only when this step
                # actually crosses a save point
                f_end = jax.lax.cond(
                    jnp.logical_and(accept, scond((nts, out_C, out_m))),
                    lambda: f(y_1), lambda: jnp.zeros_like(y_1))
            else:
                f_end = f_1
            nts, out_C, out_m = jax.lax.cond(
                accept,
                lambda sc: jax.lax.while_loop(scond, sbody, sc),
                lambda sc: sc,
                (nts, out_C, out_m))

            nacc = nacc + accept.astype(jnp.int32)
            nrej = nrej + (~accept).astype(jnp.int32)
            return (t_new, h_new, y_new, nts, out_C, out_m, nacc, nrej,
                    failed)

        def cond(c):
            t, _, _, _, _, _, nacc, nrej, failed = c
            return jnp.logical_and(
                t < t1 - eps,
                jnp.logical_and(~failed, nacc + nrej < max_steps))

        t, h, y, nts, out_C, out_m, nacc, nrej, failed = carry_in
        t = jnp.maximum(t, t0)
        out = jax.lax.while_loop(cond, body, (t, h, y, nts, out_C, out_m,
                                              nacc, nrej, failed))
        return out

    carry = (jnp.array(0.0, dtype), jnp.array(h0, dtype), y0,
             jnp.array(1, jnp.int32), out_C, out_m,
             jnp.array(0, jnp.int32), jnp.array(0, jnp.int32),
             jnp.array(False))
    for (t0, t1, p) in legs:
        carry = run_leg(carry, t0, t1, p)
    t, h, y, nts, out_C, out_m, nacc, nrej, failed = carry
    failed = jnp.logical_or(failed, nts <= Nts)  # not all snapshots written

    t_save = jnp.linspace(0.0, tf_total, Nts + 1).astype(dtype)
    sol = Solution(C=out_C, m=out_m, t=t_save, r=r.astype(dtype),
                   CoEGFR=Co[4])
    stats = StiffStats(n_accepted=nacc, n_rejected=nrej, failed=failed)
    return sol, stats


def solve_stiff(
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
):
    """Stiff MoL solve: adaptive TRBDF2 (default), Rosenbrock23, or
    RODAS3/RODAS4.

    ``method="rosenbrock23"`` selects the linearly implicit W-method —
    cheaper per step (no Newton iteration); ``"rodas3"`` / ``"rodas4"``
    the order-3/4 L-stable Rosenbrock tableaus (fewest steps; the
    production default of the batched engine's callers); ``"trbdf2"``
    is the Newton-based L-stable reference method.
    ``linsolve_dtype=jnp.float32`` enables mixed precision:
    factorizations, back-solves, AND the Jacobian bands in f32 with
    f64 state/residuals.  Exact for trbdf2 (the W-solve is only a
    Newton preconditioner); for the Rosenbrock methods the f32 bands
    make W-tilde *consistent* (stage solves all use the same perturbed
    W), which preserves the order — validated over the eFAST box incl.
    the x1000-bounds corners (scripts/probe_gsa_mixed.py: 0/784
    failures, p99 agreement ~1e-4, for both ros23 and rodas4).  [An
    earlier measurement showing ~70% corner failures for ros23+f32
    predates ls_dtype-native bands: f64 bands cast per-factor made
    W-tilde inconsistent between refactorizations.]

    Tolerance-matched (not step-matched) to the explicit reference path —
    the reference's own cross-validation idiom (explicit FTCS vs
    MoL/QNDF, ``define_PDESystem_base.jl:288``).  ``t_prechase`` runs the
    gefitinib pulse-chase as two exact integration legs with ``kp`` zeroed
    in the second (continuous-time event; the explicit path replicates
    the reference's step-quantized event instead).

    Returns a :class:`Solution` (and :class:`StiffStats` when
    ``return_stats``); failed lanes carry NaN snapshots plus
    ``stats.failed``.
    """
    Co = jnp.asarray(Co)
    params = Params(D=params.D.astype(Co.dtype), k=params.k.astype(Co.dtype))
    if t_prechase is None:
        legs = ((0.0, float(tf), params),)
    else:
        p2 = params.replace(kp=0.0)
        legs = ((0.0, float(t_prechase), params),
                (float(t_prechase), float(tf), p2))
    ls = jnp.dtype(linsolve_dtype).name if linsolve_dtype else None
    sol, stats = _solve_stiff_impl(system, Co, params, legs, float(R),
                                   float(dr), int(Nts), rtol, atol,
                                   int(max_steps), float(h0), method, ls)
    if return_stats:
        return sol, stats
    return sol
