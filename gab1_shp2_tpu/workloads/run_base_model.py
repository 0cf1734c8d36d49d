"""Base-model analysis driver (port of ``Julia/run_base_model.jl``).

Single baseline solve, posterior-ensemble median/68%-CI surfaces for
active SFKs and GAB1-SHP2, the model-vs-experiment %SHP2-bound-GAB1
comparison, and single-parameter perturbation sweeps.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

import gab1_shp2_tpu as g
from gab1_shp2_tpu.models.observables import pct_shp2_bound_gab1
from gab1_shp2_tpu.models.params import EXPTL_PCT_SHP2_BOUND_GAB1, Params
from gab1_shp2_tpu.workloads import common


def main(argv=None):
    ap = common.default_argparser(__doc__)
    ap.add_argument("--perturb", action="store_true",
                    help="run the single-parameter perturbation sweeps "
                         "(run_base_model.jl:465-818)")
    args = ap.parse_args(argv)
    system = g.base_system()
    Co = g.default_co()
    R = 10.0
    out = args.outdir
    os.makedirs(out, exist_ok=True)

    # --- single baseline solve (run_base_model.jl:83) ---
    sol = g.solve_stiff(system, Co, g.default_params(), dr=args.dr,
                        tf=args.tf, Nts=args.nts, rtol=args.rtol)
    r, t = np.asarray(sol.r), np.asarray(sol.t)
    common.save_surface_plot(f"{out}/base_aSFK_surface.png", r, t,
                             np.asarray(sol.cyto("aSFK")).T,
                             "active SFKs (baseline)", "aSFK (molec/um^3)")
    common.save_surface_plot(f"{out}/base_PG1Stot_surface.png", r, t,
                             np.asarray(sol.PG1Stot).T,
                             "GAB1-SHP2 (baseline)", "PG1Stot (molec/um^3)")

    # --- ensemble median/CI surfaces (run_base_model.jl:89-175) ---
    ens = common.get_ensemble(args.n, seed=args.seed)
    kw = dict(solver=args.solver, dr=args.dr, tf=args.tf, Nts=args.nts,
              rtol=args.rtol, chunk=args.chunk)
    q_pg1s, n_ok = common.summary_surfaces(
        system, Co, ens, lambda s: s.PG1Stot, **kw)
    q_asfk, _ = common.summary_surfaces(
        system, Co, ens, lambda s: s.cyto("aSFK"), **kw)
    print(f"ensemble: {n_ok}/{len(ens)} members valid")
    common.save_surface_plot(f"{out}/ens_PG1Stot_median.png", r, t,
                             q_pg1s[1].T, "GAB1-SHP2 (ensemble median)",
                             "PG1Stot")
    common.save_surface_plot(f"{out}/ens_aSFK_median.png", r, t,
                             q_asfk[1].T, "aSFK (ensemble median)", "aSFK")
    common.save_line_plot(
        f"{out}/ens_PG1Stot_tf_profile.png", r,
        {"median": q_pg1s[1][-1]},
        "r (um)", "PG1Stot (molec/um^3)",
        "GAB1-SHP2 at tf, ensemble median with 68% CI",
        bands={"68% CI": (q_pg1s[0][-1], q_pg1s[2][-1])})

    # --- model vs experiment %SHP2-bound GAB1 (run_base_model.jl:257-311) ---
    from gab1_shp2_tpu.ensemble.engine import masked_quantiles, run_ensemble

    pct, ok = run_ensemble(system, Co, ens,
                           extract=lambda s: pct_shp2_bound_gab1(s, Co, R),
                           **kw)
    qs = np.asarray(masked_quantiles(pct, ok, qs=(0.025, 0.5, 0.975)))
    mu, sigma = EXPTL_PCT_SHP2_BOUND_GAB1
    print(f"% SHP2-bound GAB1: model median {qs[1]:.2f} "
          f"[{qs[0]:.2f}, {qs[2]:.2f}] vs experiment {mu} +- {sigma}")
    common.save_csv(f"{out}/pct_shp2_bound_gab1.csv",
                    ["q2.5", "median", "q97.5", "exptl_mu", "exptl_sigma"],
                    [[qs[0], qs[1], qs[2], mu, sigma]])

    # --- perturbation sweeps (run_base_model.jl:465-818) ---
    if args.perturb:
        base = g.default_params()
        factors = np.array([0.01, 0.1, 1.0, 10.0, 100.0])
        rows = []
        for pname in ("Dsfk", "Dg1", "Ds2", "kSa", "kSi", "kG1p", "kG1dp",
                      "kS2f", "kS2r"):
            batch = Params(
                D=jnp.stack([base.scale(**{pname: f}).D for f in factors]),
                k=jnp.stack([base.scale(**{pname: f}).k for f in factors]))
            res, ok2 = run_ensemble(system, Co, batch,
                                    extract=lambda s:
                                    pct_shp2_bound_gab1(s, Co, R), **kw)
            for f, v, o in zip(factors, np.asarray(res), np.asarray(ok2)):
                rows.append([pname, f, float(v) if o else np.nan])
        common.save_csv(f"{out}/perturbation_pct_bound.csv",
                        ["param", "factor", "pct_shp2_bound_gab1"], rows)
        print(f"perturbation sweep written ({len(rows)} rows)")


if __name__ == "__main__":
    main()
