"""Run the sampler health gate over COMMITTED posterior chains.

``inference/diagnostics.py`` (split R-hat, rank-normalized ESS,
frozen-chain detection) was added in round 4 and is wired into every
new ``fit_and_infer`` NUTS run — but the surrogate posteriors shipped
in rounds 2-3 predate the gate, and the round-4 post-mortem proved
plausible-looking quantiles can hide frozen chains.  This script
retro-fits the gate: it reconstructs the (chains, draws, dim) layout
from the committed ``posterior_samples*.csv`` (rows are chain-major —
``fit_and_infer`` reshapes ``(chains, draws, 4) -> (-1, 4)``), runs
``check_chains``, and writes the same ``nuts_diagnostics{tag}.csv``
a fresh run would.

The committed CSVs don't carry per-draw divergence flags (those live
only in the run's checkpoint), so ``_divergence_rate`` is NaN here;
the frozen-chain and R-hat/ESS gates are the ones that catch the
round-4 failure mode.  Reference analog: Turing's
``summarystats(chain)`` table (param_fitting+inference_finitediff.jl:450-460).

Usage: python scripts/gen_nuts_diagnostics.py <samples.csv> <chains> <out.csv>
  or with no args: run over the standard committed set.
"""

import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gab1_shp2_tpu.inference.diagnostics import check_chains  # noqa: E402

FIT_NAMES = ("kG1p", "kG1dp", "kSa", "kSi")


def run(samples_csv: str, chains: int, out_csv: str) -> bool:
    arr = np.loadtxt(samples_csv, delimiter=",", skiprows=1)
    q = np.log(arr[:, :4])  # chains sample in log space
    n = len(q) // chains
    qs = q[: chains * n].reshape(chains, n, 4)
    report = check_chains(qs, None, names=FIT_NAMES)
    with open(out_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["param", "rhat", "ess"])
        for name in FIT_NAMES:
            w.writerow([name, report["rhat"][name], report["ess"][name]])
        w.writerow(["_divergence_rate", float("nan"), ""])
        w.writerow(["_ok", int(report["ok"]), ""])
    status = "ok" if report["ok"] else "FAILED: " + "; ".join(
        report["failures"])
    print(f"{samples_csv} ({chains} chains x {n}): {status} -> {out_csv}")
    return bool(report["ok"])


def main():
    if len(sys.argv) == 4:
        ok = run(sys.argv[1], int(sys.argv[2]), sys.argv[3])
        sys.exit(0 if ok else 1)
    base = os.path.join(os.path.dirname(__file__), "..", "results",
                        "inference")
    jobs = [
        (f"{base}/posterior_samples.csv", 5,
         f"{base}/nuts_diagnostics.csv"),
        (f"{base}/posterior_samples_hela.csv", 5,
         f"{base}/nuts_diagnostics_hela.csv"),
        (f"{base}/exact_nuts/posterior_samples.csv", 2,
         f"{base}/exact_nuts/nuts_diagnostics.csv"),
    ]
    all_ok = True
    for csv_path, chains, out in jobs:
        if os.path.exists(csv_path):
            all_ok &= run(csv_path, chains, out)
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
