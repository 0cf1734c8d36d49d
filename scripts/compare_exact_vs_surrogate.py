"""Build ``comparison_vs_surrogate.csv`` for an exact-likelihood NUTS
run: per-parameter median ratio and central-50%-interval overlap vs the
committed surrogate+reweighting posterior (the production route).

Usage:
    python scripts/compare_exact_vs_surrogate.py \
        results/inference/exact_nuts_r4 [results/inference]

Reads ``posterior_quantiles.csv`` from both directories, writes the
comparison CSV into the first.  Pure stdlib (safe during TPU-tunnel
outages: never imports jax).
"""

import csv
import sys


def load(path):
    with open(path) as f:
        return {r["param"]: {k: float(v) for k, v in r.items()
                             if k != "param"}
                for r in csv.DictReader(f)}


def main():
    exact_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "results/inference/exact_nuts_r4"
    sur_dir = sys.argv[2] if len(sys.argv) > 2 else "results/inference"
    # optional condition tag ("_hela"): picks the tagged quantile CSVs
    # on BOTH sides (fit_and_infer names HeLa artifacts with the tag)
    tag = sys.argv[3] if len(sys.argv) > 3 else ""
    exact = load(f"{exact_dir}/posterior_quantiles{tag}.csv")
    sur = load(f"{sur_dir}/posterior_quantiles{tag}.csv")
    rows = []
    worst = 1.0
    for n, e in exact.items():
        s = sur[n]
        ratio = e["q0.5"] / s["q0.5"]
        worst = max(worst, ratio, 1.0 / ratio)
        overlap = e["q0.25"] < s["q0.75"] and s["q0.25"] < e["q0.75"]
        rows.append([n, e["q0.5"], s["q0.5"], round(ratio, 4),
                     e["q0.25"], e["q0.75"], s["q0.25"], s["q0.75"],
                     overlap])
        print(f"{n}: median ratio {ratio:.3f}, IQR overlap {overlap}")
    out = f"{exact_dir}/comparison_vs_surrogate.csv"
    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["param", "exact_q0.5", "surrogate_q0.5",
                    "median_ratio", "exact_q0.25", "exact_q0.75",
                    "surrogate_q0.25", "surrogate_q0.75", "iqr_overlap"])
        w.writerows(rows)
    print(f"wrote {out}; worst median ratio x{worst:.3f}")


if __name__ == "__main__":
    main()
