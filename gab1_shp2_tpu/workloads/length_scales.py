"""Length-scale analysis in a large cell (port of
``Julia/length_scale_estimates.jl``).

R = 100 um, perturbations of {Dsfk, Dg1, Dg1s2, kSi, kG1dp, kS2r} by
x{0.1, 1, 10}; measured r_1/2 / r_1/10 penetration depths compared with
the order-of-magnitude estimate delta = sqrt(D/k)
(``length_scale_estimates.jl:77-122``).
"""

from __future__ import annotations

import numpy as np

import gab1_shp2_tpu as g
from gab1_shp2_tpu.ensemble.engine import run_ensemble
from gab1_shp2_tpu.models.observables import gsa_outputs
from gab1_shp2_tpu.models.params import Params
from gab1_shp2_tpu.workloads import common

R_BIG = 100.0
PERTURB = ("Dsfk", "Dg1", "Dg1s2", "kSi", "kG1dp", "kS2r")
FACTORS = (0.1, 1.0, 10.0)


def delta_estimates(p: Params) -> dict:
    """delta = sqrt(D/k) length-scale estimates
    (``length_scale_estimates.jl:112-122``): aSFK from (Dsfk, kSi);
    GAB1-SHP2 as the sum of the pGAB1 and complex contributions."""
    d_sfk = float(np.sqrt(p.Dsfk / p.kSi))
    d_pg1 = float(np.sqrt(p.Dg1 / p.kG1dp))
    d_pg1s = float(np.sqrt(p.Dg1s2 / p.kS2r))
    return {"aSFK": d_sfk, "PG1S": d_pg1 + d_pg1s}


def main(argv=None):
    ap = common.default_argparser(__doc__)
    ap.set_defaults(dr=1.0, nts=2, tf=5.0)
    args = ap.parse_args(argv)
    system = g.base_system()
    Co = g.default_co(R=R_BIG)

    import jax.numpy as jnp

    base = g.default_params()
    rows = []
    for pname in PERTURB:
        batch = Params(
            D=jnp.stack([base.scale(**{pname: f}).D for f in FACTORS]),
            k=jnp.stack([base.scale(**{pname: f}).k for f in FACTORS]))
        out, ok = run_ensemble(
            system, Co, batch, solver=args.solver, R=R_BIG, dr=args.dr,
            tf=args.tf, Nts=args.nts, rtol=args.rtol,
            linsolve_dtype=common.linsolve_dtype(args),
            scheduler=common.scheduler(args),
            extract=lambda s: gsa_outputs(s, R_BIG))
        for f, o, valid in zip(FACTORS, np.asarray(out), np.asarray(ok)):
            p_f = base.scale(**{pname: f})
            d = delta_estimates(p_f)
            rows.append([pname, f, *(o if valid else [np.nan] * 6),
                         d["aSFK"], d["PG1S"]])
            if valid:
                print(f"{pname} x{f:g}: r1/2(aSFK)={o[0]:.1f} um "
                      f"(delta={d['aSFK']:.1f}), "
                      f"r1/2(PG1S)={o[2]:.1f} (delta~{d['PG1S']:.1f})")
    common.save_csv(
        f"{args.outdir}/length_scales_R100.csv",
        ["param", "factor", "r12_sfk", "r110_sfk", "r12_pg1s",
         "r110_pg1s", "cs_ratio", "pg1s_ave", "delta_sfk", "delta_pg1s"],
        rows)


if __name__ == "__main__":
    main()
