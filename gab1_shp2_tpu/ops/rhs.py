"""Lowering of the declarative reaction system to fused XLA compute.

Builds, at trace time, the pieces every stepper consumes:

  * ``bulk_rates``      — mass-action net rates for the 10 bulk species,
                          vectorized over radial nodes,
  * ``memb_rates``      — the 8 membrane ODE right-hand sides,
  * ``bc_closure``      — the Robin (reactive-flux) boundary values of the
                          bulk species at r = R, given the membrane state
                          (ghost-node elimination; ``basepdesolver.jl:197-215``),
  * ``laplacian``       — spherical / Cartesian stencil
                          (``basepdesolver.jl:151``, ``basepdesolver_rect.jl:132``),
  * ``make_mol_rhs``    — the fused method-of-lines RHS ``f(y, params)``
                          for the stiff implicit path.

The Python loops over reaction tables unroll during tracing into one flat
XLA graph — there is no interpretive overhead at run time, and XLA fuses
the stencil and all reaction terms into a handful of elementwise kernels.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from gab1_shp2_tpu.models.params import Params
from gab1_shp2_tpu.models.species import (
    CYTO,
    DIFF_SLOT_OF_CYTO,
    K_NAMES,
    MEMB,
    N_CYTO,
    N_MEMB,
)
from gab1_shp2_tpu.models.system import (
    D_ASFK_MEMB,
    ETOT_MEMBERS,
    ETOT_SCALE,
    Geometry,
    ReactionDiffusionSystem,
)

_K_IDX = {n: i for i, n in enumerate(K_NAMES)}
_ETOT_IDX = tuple(MEMB[s] for s in ETOT_MEMBERS)


def kdict(k: jax.Array) -> Dict[str, jax.Array]:
    """Split the packed kinetic vector into named scalars."""
    return {name: k[..., i] for name, i in _K_IDX.items()}


def effective_diffusivities(system: ReactionDiffusionSystem,
                            params: Params) -> jax.Array:
    """Per-bulk-species diffusivities (10,), from the 7-slot D vector.

    The membrane-confined-SFK variant pins aSFK's diffusivity to 1e-32
    (``basepdesolver.jl:366``).
    """
    d = params.D[..., jnp.array(DIFF_SLOT_OF_CYTO)]
    if system.memb_sfk:
        d = d.at[..., CYTO["aSFK"]].set(D_ASFK_MEMB)
    return d


def _net_reaction_terms(reactions, conc, k: Dict[str, jax.Array], out):
    """Accumulate mass-action net-rate contributions into ``out``.

    ``conc(name)`` returns the concentration array for a species;
    ``out`` is a dict name -> accumulated d/dt expression (same shape).
    """
    for rx in reactions:
        rf = k[rx.kf]
        if rx.rate_scale is not None:
            rf = rf * k[rx.rate_scale]
        for s, st in zip(rx.reactants, rx.r_stoich()):
            c = conc(s)
            rf = rf * (c if st == 1 else c**st)
        for s in rx.catalysts:
            rf = rf * conc(s)
        net = rf
        if rx.kr is not None:
            rr = k[rx.kr]
            for s, st in zip(rx.products, rx.p_stoich()):
                c = conc(s)
                rr = rr * (c if st == 1 else c**st)
            net = rf - rr
        for s, st in zip(rx.reactants, rx.r_stoich()):
            out[s] = out[s] - st * net
        for s, st in zip(rx.products, rx.p_stoich()):
            out[s] = out[s] + st * net
    return out


def bulk_rates(system: ReactionDiffusionSystem, C: jax.Array,
               k: Dict[str, jax.Array]) -> jax.Array:
    """Net mass-action rates for the bulk species.

    ``C`` has shape (10, n) (species, nodes); returns the same shape.
    Reproduces the reaction terms of ``basepdesolver.jl:151-180``.
    """
    zero = jnp.zeros_like(C[0])
    out = {name: zero for name in CYTO}
    out = _net_reaction_terms(system.bulk_reactions,
                              lambda s: C[CYTO[s]], k, out)
    return jnp.stack([out[name] for name in CYTO])


def memb_rates(system: ReactionDiffusionSystem, m: jax.Array,
               C_R: jax.Array, k: Dict[str, jax.Array]) -> jax.Array:
    """Membrane ODE right-hand sides (8,).

    ``m`` is the membrane state; ``C_R`` the bulk concentrations at r = R.
    Mirrors ``basepdesolver.jl:220-231`` (membrane-only reactions plus the
    surface-binding source terms, with bulk concentrations evaluated at
    the membrane).
    """
    zero = jnp.zeros_like(m[..., 0])
    out = {name: zero for name in MEMB}
    out = _net_reaction_terms(system.memb_reactions,
                              lambda s: m[..., MEMB[s]], k, out)
    for sb in system.surface_bindings:
        net = (k[sb.kf] * C_R[..., CYTO[sb.cyto]] * m[..., MEMB[sb.memb]]
               - k[sb.kr] * m[..., MEMB[sb.product]])
        out[sb.memb] = out[sb.memb] - net
        out[sb.product] = out[sb.product] + net
    return jnp.stack([out[name] for name in MEMB], axis=-1)


def etot(m: jax.Array) -> jax.Array:
    """Total signaling-competent (phosphorylated) EGFR:
    ``2*(E + EG2 + EG2G1 + EG2PG1 + EG2PG1S)`` (``basepdesolver.jl:205``)."""
    return ETOT_SCALE * sum(m[..., i] for i in _ETOT_IDX)


def bc_closure(system: ReactionDiffusionSystem, C_near: jax.Array,
               m: jax.Array, k: Dict[str, jax.Array], d_eff: jax.Array,
               dr) -> jax.Array:
    """Bulk-species boundary values at r = R by ghost-node elimination.

    Solves the first-order discrete Robin condition
    ``D (u_R - u_near)/dr = gain - loss * u_R`` for each species:
    ``u_R = (u_near + gain*dr/D) / (1 + loss*dr/D)``
    (``basepdesolver.jl:206-215``).  ``C_near`` is the last interior node
    value (10,); ``m`` the membrane state used in the flux terms.

    The SFK pair is special: iSFK is consumed at the surface with rate
    ``kSa*Etot*iSFK_R`` and aSFK is produced with the *same* rate, so the
    aSFK gain term uses the freshly eliminated iSFK_R
    (``basepdesolver.jl:206-207``).
    """
    # accumulate per-species gain/loss terms at trace time (python-side
    # lists -> one stack; no scatter ops, which Pallas cannot lower)
    zero = jnp.zeros_like(C_near[..., 0])
    gains = [zero] * len(CYTO)
    losses = [zero] * len(CYTO)
    for sb in system.surface_bindings:
        ci = CYTO[sb.cyto]
        gains[ci] = gains[ci] + k[sb.kr] * m[..., MEMB[sb.product]]
        losses[ci] = losses[ci] + k[sb.kf] * m[..., MEMB[sb.memb]]
    Et = etot(m)
    losses[CYTO["iSFK"]] = losses[CYTO["iSFK"]] + k["kSa"] * Et

    g = jnp.stack(gains, axis=-1)
    l = jnp.stack(losses, axis=-1)
    C_R = (C_near + g * dr / d_eff) / (1.0 + l * dr / d_eff)
    # aSFK: produced at the surface at the iSFK consumption rate.
    a = CYTO["aSFK"]
    asfk_R = (C_near[..., a]
              + k["kSa"] * C_R[..., CYTO["iSFK"]] * Et * dr / d_eff[..., a])
    mask = jnp.arange(len(CYTO), dtype=jnp.int32) == a  # int32: int64 has no Mosaic lowering
    return jnp.where(mask, asfk_R[..., None], C_R)


def laplacian(system: ReactionDiffusionSystem, C: jax.Array, r: jax.Array,
              dr) -> jax.Array:
    """Diffusion stencil at interior nodes.

    ``C``: (10, n) with n = Nr+1 nodes (node 0 at r=0, node Nr at r=R);
    returns (10, n-2) for nodes 1..n-2.  Spherical uses the reference's
    exact discrete form ``1/(r dr) (u_{j+1}-u_{j-1}) + (u_{j+1}-2u_j+u_{j-1})/dr^2``
    (``basepdesolver.jl:151``); Cartesian drops the metric term
    (``basepdesolver_rect.jl:132``).
    """
    um, uc, up = C[..., :-2], C[..., 1:-1], C[..., 2:]
    # (up-uc)-(uc-um) instead of up-2uc+um: each inner subtraction of
    # neighbouring values rounds relative to the *difference* (exact by
    # Sterbenz when within 2x), so the second difference carries ~eps
    # relative error instead of ~eps*|C|/|d2C| — required for the mixed
    # f32 RHS path (ops/batch_stiff.py rhs_mixed) and harmless in f64
    lap = ((up - uc) - (uc - um)) / dr**2
    if system.geometry is Geometry.SPHERICAL:
        lap = lap + (up - um) / (r[1:-1] * dr)
    return lap


class MolState(NamedTuple):
    """Method-of-lines state: interior bulk nodes + membrane species.

    ``C_int``: (10, Nr-1) bulk concentrations at nodes 1..Nr-1;
    ``m``: (8,) membrane concentrations.  The r=0 node and the r=R node
    are algebraic (zero-flux copy and Robin elimination respectively), so
    they are not part of the ODE state — mirroring the reference scheme
    where those nodes are set by boundary conditions each step
    (``basepdesolver.jl:182-215``).
    """

    C_int: jax.Array
    m: jax.Array


def initial_state(Co: jax.Array, Nr: int) -> MolState:
    """Initial condition (``basepdesolver.jl:94-97,137-141``): uniform
    iSFK/GRB2/GAB1/SHP2 at their total concentrations, EGFR as mE."""
    dtype = Co.dtype
    C = jnp.zeros((N_CYTO, Nr - 1), dtype)
    C = C.at[CYTO["iSFK"]].set(Co[0])
    C = C.at[CYTO["GRB2"]].set(Co[1])
    C = C.at[CYTO["GAB1"]].set(Co[2])
    C = C.at[CYTO["SHP2"]].set(Co[3])
    m = jnp.zeros((N_MEMB,), dtype).at[MEMB["mE"]].set(Co[4])
    return MolState(C_int=C, m=m)


def full_profile(system: ReactionDiffusionSystem, y: MolState,
                 k: Dict[str, jax.Array], d_eff: jax.Array, dr) -> jax.Array:
    """Reconstruct the (10, Nr+1) bulk profile including boundary nodes."""
    C_R = bc_closure(system, y.C_int[:, -1], y.m, k, d_eff, dr)
    return jnp.concatenate(
        [y.C_int[:, :1], y.C_int, C_R[:, None]], axis=1)


def make_mol_rhs(system: ReactionDiffusionSystem, R: float, dr: float):
    """Build the fused MoL right-hand side ``f(y, params) -> dy``.

    The returned function is jit/vmap/jacfwd-friendly: boundary closures
    are algebraic, so there is no inner iteration, and all shapes are
    static.  This is the production (stiff implicit) compute path.
    """
    Nr = int(round(R / dr))
    r = jnp.arange(Nr + 1) * dr

    def rhs(y: MolState, params: Params) -> MolState:
        k = kdict(params.k)
        d_eff = effective_diffusivities(system, params)
        C_full = full_profile(system, y, k, d_eff, dr)
        lap = laplacian(system, C_full, r, dr)
        dC = d_eff[:, None] * lap + bulk_rates(system, y.C_int, k)
        C_R = C_full[:, -1]
        dm = memb_rates(system, y.m, C_R, k)
        return MolState(C_int=dC, m=dm)

    return rhs, r
