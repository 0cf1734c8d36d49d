"""eFAST / Sobol GSA drivers (ports of
``Julia/GSA_diffs+kinetic-params_MoL.jl``,
``GSA_diff+kinetic-params_memb-SFK_MoL.jl`` and ``GSA_concs.jl``).

Writes S1/ST CSVs in the reference's layout (one row per parameter,
one column per output variable).
"""

from __future__ import annotations

import numpy as np

import gab1_shp2_tpu as g
from gab1_shp2_tpu.gsa.runner import (
    GSA_VAR_NAMES,
    conc_bounds,
    dk_bounds,
    make_conc_evaluator,
    make_param_evaluator,
    run_efast,
    run_sobol,
)
from gab1_shp2_tpu.models.species import CO_NAMES, PNAMES
from gab1_shp2_tpu.workloads import common


def main(argv=None):
    ap = common.default_argparser(__doc__)
    ap.add_argument("--target",
                    choices=("dk", "dk_membsfk", "concs", "concs_membsfk"),
                    default="dk")
    ap.add_argument("--samples", type=int, default=1000,
                    help="eFAST samples per parameter (reference: 1000)")
    ap.add_argument("--method", choices=("efast", "sobol"),
                    default="efast")
    ap.add_argument("--resamples", type=int, default=1)
    ap.add_argument("--max-steps", type=int, default=2500)
    ap.add_argument("--f32", action="store_true",
                    help="float32 solves: fast, but the x1000-bounds "
                         "corners hit the f32 error floor and zero out "
                         "(~60%% of samples) -- f64 with f32 linear "
                         "algebra is the default")
    args = ap.parse_args(argv)
    import jax.numpy as jnp

    solver_kw = dict(max_steps=args.max_steps)
    if args.f32:
        solver_kw["dtype"] = jnp.float32
    # default: full-f64 rosenbrock23 — the x1000-bounds corners need
    # accurate stage solves (mixed/f32 fails on most corner samples)

    system = (g.memb_sfk_system() if args.target.endswith("membsfk")
              else g.base_system())
    Co = g.default_co()
    params = g.default_params()

    if args.target.startswith("concs"):
        # GSA over initial concentrations (GSA_concs.jl:62-71)
        bounds = conc_bounds(Co)
        names = CO_NAMES
        evaluate = make_conc_evaluator(system, params, dr=args.dr,
                                       tf=args.tf, rtol=args.rtol,
                                       chunk=args.chunk,
                                       max_steps=args.max_steps)
    else:
        bounds = dk_bounds(params)
        names = PNAMES
        evaluate = make_param_evaluator(system, Co, dr=args.dr,
                                        tf=args.tf, rtol=args.rtol,
                                        chunk=args.chunk, **solver_kw)

    if args.method == "efast":
        S1, ST, design = run_efast(evaluate, bounds,
                                   samples=args.samples,
                                   num_harmonics=4,
                                   seed=args.seed + 123)
        tag = f"eFAST_{args.target}_{args.samples}spls"
    else:
        S1, ST, design = run_sobol(evaluate, bounds, n=args.samples,
                                   seed=args.seed + 123)
        tag = f"Sobol_{args.target}_{args.samples}spls"

    for label, M in (("S1", S1), ("ST", ST)):
        rows = [[names[i]] + list(M[i]) for i in range(len(names))]
        common.save_csv(f"{args.outdir}/{tag}_{label}.csv",
                        ["param"] + list(GSA_VAR_NAMES), rows)
    # quick ranking printout for the average-PG1Stot output
    order = np.argsort(-ST[:, 5])
    print(f"{tag}: top-8 parameters by ST on [pG1S2]_average:")
    for i in order[:8]:
        print(f"  {names[i]:9s} ST={ST[i,5]:.3f} S1={S1[i,5]:.3f}")


if __name__ == "__main__":
    main()
