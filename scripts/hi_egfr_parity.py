"""hi-EGFR-binding parity note: per-decade linear fits + faceted figure.

Post-processes the committed kG2f sweep scatter artifacts
(``results/variants/hi_egfr_*_scatter.csv``) into the reference's
presentation — one facet per kG2f multiplier, scatter of EGFR-bound
GAB1-SHP2 fraction (x) vs center:surface ratio (y) with a per-facet
linear fit (``run_base_model_hi-EGFR-binding.jl:85-150``: AlgebraOfGraphics
``mapping(:memb_frac, :csr, col=:mult) * (Scatter + linear())``).

Writes, for base and HeLa:
  * ``results/variants/hi_egfr_<variant>_per_decade_fits.csv``
    (slope/intercept/Pearson r per multiplier + global row)
  * ``results/variants/hi_egfr_<variant>_facets.png``

Run from the repo root after ``run_variants --variant hi_egfr[_hela]``.
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gab1_shp2_tpu.workloads import common


def per_decade_fits(fac, frac, csr):
    """Rows of (multiplier, n, slope, intercept, r); global row last
    (multiplier = 0 sentinel, matching the reference's pooled view)."""
    rows = []
    for f in np.unique(fac):
        m = fac == f
        slope, intercept = np.polyfit(frac[m], csr[m], 1)
        r = np.corrcoef(frac[m], csr[m])[0, 1]
        rows.append([float(f), int(m.sum()), slope, intercept, r])
    slope, intercept = np.polyfit(frac, csr, 1)
    r = np.corrcoef(frac, csr)[0, 1]
    rows.append([0.0, len(frac), slope, intercept, r])
    return rows


def main():
    for variant, title in (("hi_egfr", "base"), ("hi_egfr_hela", "HeLa")):
        path = f"results/variants/hi_egfr_{variant}_scatter.csv"
        d = np.genfromtxt(path, delimiter=",", names=True)
        fac = d["kG2f_factor"]
        frac = d["egfr_bound_frac"]
        csr = d["cs_ratio"]

        rows = per_decade_fits(fac, frac, csr)
        common.save_csv(
            f"results/variants/hi_egfr_{variant}_per_decade_fits.csv",
            ["kG2f_factor", "n", "slope", "intercept", "pearson_r"], rows)
        for f, n, s, i, r in rows:
            label = f"x{f:g}" if f else "global"
            print(f"{variant} {label}: n={n} slope={s:.4g} "
                  f"intercept={i:.4g} r={r:.4f}")

        facs = np.unique(fac)
        fig, axes = plt.subplots(1, len(facs), figsize=(3.0 * len(facs), 3.2),
                                 sharey=True)
        for ax, f in zip(np.atleast_1d(axes), facs):
            m = fac == f
            ax.scatter(frac[m], csr[m], s=6, alpha=0.25, color="#2a6f97")
            slope, intercept = np.polyfit(frac[m], csr[m], 1)
            xs = np.linspace(frac[m].min(), frac[m].max(), 2)
            ax.plot(xs, slope * xs + intercept, color="#bc4749", lw=1.5)
            r = np.corrcoef(frac[m], csr[m])[0, 1]
            ax.set_title(f"kG2f x{f:g}  (r={r:.3f})", fontsize=9)
            ax.set_xlabel("fraction EGFR-bound\nGAB1-SHP2", fontsize=8)
            ax.set_ylim(0, 1.05)
            ax.tick_params(labelsize=8)
        np.atleast_1d(axes)[0].set_ylabel("[G1S2](0)/[G1S2](R)", fontsize=9)
        fig.suptitle(f"EGFR-bound GAB1-SHP2 vs center:surface ratio "
                     f"({title}, N=500/facet)", fontsize=10)
        fig.tight_layout()
        out = f"results/variants/hi_egfr_{variant}_facets.png"
        fig.savefig(out, dpi=150)
        plt.close(fig)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
