"""Explicit FTCS stepper with semi-implicit membrane coupling.

This is the *parity* path: it reproduces the reference's hand-rolled
explicit scheme (``basepdesolver.jl:25-312``) step for step —

  1. forward-Euler update of all bulk species at interior nodes from the
     previous step's profile (``basepdesolver.jl:150-180``),
  2. zero-flux copy at r = 0 (``:182-192``),
  3. a fixed-point loop coupling the Robin boundary values at r = R with
     an explicit-Euler update of the 8 membrane ODEs, iterated until the
     max relative change drops below ``tol`` or ``maxiters`` is reached
     (``:197-242``; NaN relative errors keep iterating, as in the
     reference where ``error <= tol`` is false for NaN),
  4. state rotation and snapshot capture whenever accumulated time
     crosses the next save threshold (``:244-295``).

TPU mapping: the whole time loop is one ``lax.fori_loop`` inside jit —
each iteration is a fused elementwise update over the (species, node)
array, and the solver is designed to be ``vmap``-ed over an ensemble
axis (per-member ``dt`` may be traced; the step *count* is static, with
per-member active-step masking so members with larger stability steps
finish early).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from gab1_shp2_tpu.models.params import Params, stability_dt
from gab1_shp2_tpu.models.species import N_CYTO, N_MEMB
from gab1_shp2_tpu.models.system import ReactionDiffusionSystem
from gab1_shp2_tpu.ops.rhs import (
    bc_closure,
    bulk_rates,
    effective_diffusivities,
    initial_state,
    kdict,
    laplacian,
    memb_rates,
)
from gab1_shp2_tpu.ops.solution import Solution

_KP_IDX = 10  # index of kp in the kinetic vector (species.K_NAMES)


def _membrane_fixed_point(system, C_near, m_prev, guess_CR, guess_m, k,
                          d_eff, dr, dt, maxiters, tol):
    """The semi-implicit membrane/boundary fixed point of one time step."""

    def cond(carry):
        _, _, err, it = carry
        # NaN err (0/0 relative change) must keep iterating, as in the
        # reference's `if error <= tol break` (basepdesolver.jl:239).
        return jnp.logical_and(it < maxiters, ~(err <= tol))

    def body(carry):
        C_R_prev, m_it_prev, _, it = carry
        C_R = bc_closure(system, C_near, m_it_prev, k, d_eff, dr)
        m_new = m_prev + dt * memb_rates(system, m_prev, C_R, k)
        new = jnp.concatenate([C_R, m_new])
        old = jnp.concatenate([C_R_prev, m_it_prev])
        err = jnp.max(jnp.abs(1.0 - new / old))
        return (C_R, m_new, err, it + 1)

    init = (guess_CR, guess_m, jnp.array(jnp.inf, C_near.dtype),
            jnp.array(0, jnp.int32))
    C_R, m_new, _, _ = jax.lax.while_loop(cond, body, init)
    return C_R, m_new


@partial(jax.jit, static_argnames=("system", "R", "dr", "tf", "Nts",
                                   "n_steps", "maxiters"))
def _solve_explicit_impl(system: ReactionDiffusionSystem, Co, params: Params,
                         dt, nt_active, R, dr, tf, Nts, n_steps, maxiters,
                         tol, t_prechase):
    dtype = Co.dtype
    Nr = int(round(R / dr))
    r = jnp.arange(Nr + 1, dtype=dtype) * dr
    dt_save = tf / Nts

    k_vec = params.k
    d_eff = effective_diffusivities(system, params)

    y0 = initial_state(Co, Nr)
    C0 = jnp.concatenate(
        [y0.C_int[:, :1], y0.C_int, y0.C_int[:, -1:]], axis=1)
    m0 = y0.m

    out_C = jnp.zeros((Nts + 1, N_CYTO, Nr + 1), dtype).at[0].set(C0)
    out_m = jnp.zeros((Nts + 1, N_MEMB), dtype).at[0].set(m0)
    t_out = jnp.zeros((Nts + 1,), dtype)

    def step(i, carry):
        C, m, gCR, gm, t, t_save, nts, out_C, out_m, t_out = carry

        # gefitinib pulse-chase event: zero kp from the first step whose
        # start time has crossed t_prechase (pulsechase_solver.jl:156-158).
        if t_prechase is None:
            k = kdict(k_vec)
        else:
            kp_off = t >= t_prechase
            k_eff = k_vec.at[_KP_IDX].multiply(
                jnp.where(kp_off, 0.0, 1.0).astype(dtype))
            k = kdict(k_eff)

        lap = laplacian(system, C, r, dr)
        C_int_old = C[:, 1:-1]
        Cn_int = C_int_old + dt * (d_eff[:, None] * lap
                                   + bulk_rates(system, C_int_old, k))
        C_near = Cn_int[:, -1]

        C_R, m_new = _membrane_fixed_point(
            system, C_near, m, gCR, gm, k, d_eff, dr, dt, maxiters, tol)

        C_new = jnp.concatenate([Cn_int[:, :1], Cn_int, C_R[:, None]], axis=1)
        t_new = t + dt

        # snapshot capture (basepdesolver.jl:268-295)
        pred = t_new >= t_save
        idx = nts + pred.astype(jnp.int32)
        cur_C = jax.lax.dynamic_index_in_dim(out_C, idx, keepdims=False)
        cur_m = jax.lax.dynamic_index_in_dim(out_m, idx, keepdims=False)
        cur_t = t_out[idx]
        out_C = jax.lax.dynamic_update_index_in_dim(
            out_C, jnp.where(pred, C_new, cur_C), idx, 0)
        out_m = jax.lax.dynamic_update_index_in_dim(
            out_m, jnp.where(pred, m_new, cur_m), idx, 0)
        t_out = t_out.at[idx].set(jnp.where(pred, t_new, cur_t))
        t_save = t_save + jnp.where(pred, dt_save, 0.0)

        new_carry = (C_new, m_new, C_R, m_new, t_new, t_save, idx,
                     out_C, out_m, t_out)

        # members whose own step count is exhausted stop evolving
        active = i < nt_active
        return jax.tree_util.tree_map(
            lambda n, o: jnp.where(active, n, o), new_carry, carry)

    zero_CR = jnp.zeros((N_CYTO,), dtype)
    zero_m = jnp.zeros((N_MEMB,), dtype)
    init = (C0, m0, zero_CR, zero_m, jnp.array(0.0, dtype),
            jnp.array(dt_save, dtype), jnp.array(0, jnp.int32),
            out_C, out_m, t_out)
    final = jax.lax.fori_loop(0, n_steps, step, init)
    _, _, _, _, _, _, _, out_C, out_m, t_out = final

    return Solution(C=out_C, m=out_m, t=t_out, r=r, CoEGFR=Co[4])


def solve_explicit(
    system: ReactionDiffusionSystem,
    Co: jax.Array,
    params: Params,
    *,
    R: float = 10.0,
    dr: float = 0.1,
    tf: float = 5.0,
    Nts: int = 100,
    dt: Optional[float] = None,
    n_steps: Optional[int] = None,
    nt_active=None,
    maxiters: int = 100,
    tol: float = 1e-6,
    t_prechase: Optional[float] = None,
) -> Solution:
    """Run the explicit reference-parity solve.

    Defaults mirror ``pdesolver`` (``basepdesolver.jl:25-33``): stability
    step ``dt = 0.99/(2(max(D)/dr^2 + sum(k)/4))``, ``Nts`` snapshots.

    For vmapped ensembles pass a traced per-member ``dt`` together with a
    static ``n_steps`` (max over members) and traced ``nt_active``
    (per-member ``ceil(tf/dt)``); lanes beyond their own step count stop
    evolving.  ``t_prechase`` enables the gefitinib pulse-chase event.
    """
    if dt is None:
        dt = float(stability_dt(params, dr))
    if n_steps is None:
        n_steps = int(math.ceil(tf / float(dt)))
    if nt_active is None:
        nt_active = n_steps
    # unify compute dtype (a float32 Co selects the single-precision path)
    Co = jnp.asarray(Co)
    params = Params(D=params.D.astype(Co.dtype), k=params.k.astype(Co.dtype))
    return _solve_explicit_impl(
        system, Co, params, jnp.asarray(dt, Co.dtype), nt_active,
        float(R), float(dr), float(tf), int(Nts), int(n_steps),
        int(maxiters), tol, t_prechase)
