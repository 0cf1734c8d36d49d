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
    ap.add_argument("--scales", action="store_true",
                    help="time/length-scale analysis over the ensemble "
                         "(run_base_model.jl:823-902)")
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
              rtol=args.rtol, chunk=args.chunk,
              linsolve_dtype=common.linsolve_dtype(args))
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
    # ~89% credible interval for the reference's bar figure
    # (run_base_model.jl:294-296: quantile(0.5 -+ 0.445))
    q89 = np.asarray(masked_quantiles(pct, ok, qs=(0.055, 0.945)))
    mu, sigma = EXPTL_PCT_SHP2_BOUND_GAB1
    print(f"% SHP2-bound GAB1: model median {qs[1]:.2f} "
          f"[{qs[0]:.2f}, {qs[2]:.2f}] vs experiment {mu} +- {sigma}")
    common.save_csv(f"{out}/pct_shp2_bound_gab1.csv",
                    ["q2.5", "median", "q97.5", "exptl_mu", "exptl_sigma",
                     "q5.5", "q94.5"],
                    [[qs[0], qs[1], qs[2], mu, sigma, q89[0], q89[1]]])
    common.save_bar_comparison(
        f"{out}/pct_bound_model_vs_expt.png",
        [("model", qs[1], qs[1] - q89[0], q89[1] - qs[1]),
         ("Expt", mu, sigma, sigma)],
        "% SHP2-bound\nGAB1",
        "Model (89% CI) vs experiment (run_base_model.jl:257-311)")

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

    if args.scales:
        _scales_analysis(ens, g.default_params(), out)


def _scales_analysis(ens, base, out):
    """Ensemble time scales (run_base_model.jl:823-855) and
    order-of-magnitude delta = sqrt(D/k) length scales (:858-902)."""
    from gab1_shp2_tpu.models.species import PNAMES

    idx = {n: i for i, n in enumerate(PNAMES)}
    e = np.asarray(ens)
    tau = {
        "tau_Si": 60.0 / e[:, idx["kSi"]],
        "tau_G1dp": 60.0 / e[:, idx["kG1dp"]],
        "tau_S2r": 60.0 / e[:, idx["kS2r"]],
    }
    R = 10.0
    print(f"tau_EGFRp  = {60.0 / float(base.kp):.3g} sec")
    print(f"tau_EGFRdp = {60.0 / float(base.kdp):.3g} sec")
    print(f"tau_Dsfk   = {R**2 / (6 * float(base.Dsfk)) * 60:.3g} sec")
    print(f"tau_Dg1s2  = {R**2 / (6 * float(base.Dg1s2)) * 60:.3g} sec")
    for name, v in tau.items():
        print(f"{name} median = {np.median(v):.3g} sec")

    delta = {
        "delta_SFK": np.sqrt(e[:, idx["Dsfk"]] / e[:, idx["kSi"]]),
        "delta_dis": np.sqrt(e[:, idx["Dg1s2"]] / e[:, idx["kS2r"]]),
        "delta_dep": np.sqrt(e[:, idx["Dg1"]] / e[:, idx["kG1dp"]]),
    }
    delta["delta_G1S2"] = (delta["delta_SFK"] + delta["delta_dis"]
                           + delta["delta_dep"])
    rows = []
    for name, v in delta.items():
        q = np.quantile(v, [0.159, 0.5, 0.841])
        rows.append([name, q[1], q[0], q[2]])
        print(f"{name}: median {q[1]:.2f} um [{q[0]:.2f}, {q[2]:.2f}]")
    common.save_csv(f"{out}/oom_length_scales.csv",
                    ["scale", "median_um", "lo68", "hi68"], rows)


if __name__ == "__main__":
    main()
