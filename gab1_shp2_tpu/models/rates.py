"""Space/time-averaged reaction-rate summaries.

Port of the rate extraction in ``Julia/calc_rxn_rates.jl:106-155``:
per-ensemble-member averages of SFK activation/inactivation and GAB1
(de)phosphorylation rates, with the reference's unit convention
(molecules/um^3/min; multiply by ``MOLEC_TO_UM`` for uM/min).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from gab1_shp2_tpu.models.params import Params
from gab1_shp2_tpu.ops.solution import Solution, spatial_average

# molecules/um^3 -> uM (calc_rxn_rates.jl:165 etc.)
MOLEC_TO_UM = 1e15 / 6.022e23 * 1e6


def _time_average(y: jax.Array, t: jax.Array, tf) -> jax.Array:
    return jnp.trapezoid(y, t, axis=-1) / tf


def reaction_rate_summaries(sol: Solution, params: Params, Co: jax.Array,
                            R: float = 10.0) -> Dict[str, jax.Array]:
    """The six rate summaries of ``calc_rxn_rates.jl`` (units:
    molecules/um^3/min, matching the reference before its uM
    conversion).

    * ``v_sfk_i``  — inactivation kSi*<aSFK>, space+time averaged
    * ``v_sfk_a``  — activation kSa*Etot*iSFK|_R (per-area flux scaled
      as in the reference via pE/(100/CoEGFR) * iSFK at r=0 index...
      the reference uses ``iSFK[1,:]`` which in its column-major layout
      is the *center* node; we follow the same expression)
    * ``v_sfk_net``— time-averaged d<aSFK>/dt
    * ``v_g1_p``   — phosphorylation kG1p*<aSFK*(GAB1+G2G1)>
    * ``v_pg1_dp`` — dephosphorylation kG1dp*<PG1tot>
    * ``v_pg1_net``— time-averaged d<PG1tot incl. membrane>/dt
    """
    t = sol.t
    tf = t[-1]
    r = sol.r

    asfk_ave = spatial_average(sol.cyto("aSFK"), r, R)  # (T,)
    v_sfk_i = _time_average(params.kSi * asfk_ave, t, tf)

    # reference expression (calc_rxn_rates.jl:126): kSa * Etot * iSFK[1,:]
    etot = sol.pE / (100.0 / Co[..., 4])
    v_sfk_a = _time_average(params.kSa * etot * sol.cyto("iSFK")[..., 0],
                            t, tf)

    dasfk = jnp.gradient(asfk_ave, t[1] - t[0], axis=-1)
    v_sfk_net = _time_average(dasfk, t, tf)

    g1_cyt = sol.cyto("GAB1") + sol.cyto("G2G1")
    v_g1_p = _time_average(
        params.kG1p * spatial_average(sol.cyto("aSFK") * g1_cyt, r, R),
        t, tf)

    pg1_cyt = spatial_average(sol.PG1tot, r, R)
    v_pg1_dp = _time_average(params.kG1dp * pg1_cyt, t, tf)

    pg1_tot = pg1_cyt + (sol.memb("EG2PG1") + sol.memb("EG2PG1S")) * 3.0 / R
    dpg1 = jnp.gradient(pg1_tot, t[1] - t[0], axis=-1)
    v_pg1_net = _time_average(dpg1, t, tf)

    return {"v_sfk_a": v_sfk_a, "v_sfk_i": v_sfk_i, "v_sfk_net": v_sfk_net,
            "v_g1_p": v_g1_p, "v_pg1_dp": v_pg1_dp, "v_pg1_net": v_pg1_net}
