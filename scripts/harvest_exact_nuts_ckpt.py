"""Harvest a mid-run exact-NUTS checkpoint into posterior artifacts.

The reference-scale exact-likelihood NUTS validation (5 chains x 1000
draws, ``param_fitting+inference_finitediff.jl:403-408``) is a
multi-hour CPU job run through the blocked, checkpointed runner in
``fit_and_infer._run_chains_on``.  That runner persists
``(state, qs, div, done)`` to ``<outdir>/cache/ckpt_nuts_<hash>.npz``
every 100-sample block; the final CSVs are only written when all
blocks finish.  This script turns whatever the checkpoint currently
holds into the same artifact set (``posterior_samples.csv``,
``posterior_quantiles.csv``, ``run.log`` summary, and
``comparison_vs_surrogate.csv`` via scripts/compare_exact_vs_surrogate)
so partial progress is committable at a round boundary and the
resumable run keeps going.

Usage:
    python scripts/harvest_exact_nuts_ckpt.py \
        [results/inference/exact_nuts_r4] [results/inference]

Pure stdlib + numpy — never imports jax, so it is safe to run while
the NUTS process owns the CPU and during TPU-tunnel outages.
"""

import csv
import glob
import importlib.util
import os
import subprocess
import sys

import numpy as np


def _load_diagnostics():
    """Load inference/diagnostics.py by file path (pure NumPy) without
    importing the package — ``gab1_shp2_tpu/__init__`` pulls in jax,
    and this script must stay safe to run during TPU-tunnel outages."""
    path = os.path.join(os.path.dirname(__file__), "..", "gab1_shp2_tpu",
                        "inference", "diagnostics.py")
    spec = importlib.util.spec_from_file_location("_diag", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod

FIT_NAMES = ("kG1p", "kG1dp", "kSa", "kSi")  # inference/loss.py:50
QS = (0.025, 0.25, 0.5, 0.75, 0.975)         # fit_and_infer.py:54


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else \
        "results/inference/exact_nuts_r4"
    sur_dir = sys.argv[2] if len(sys.argv) > 2 else "results/inference"
    # condition tag: fit_and_infer names HeLa artifacts posterior_*_hela
    tag = "_hela" if "hela" in os.path.basename(os.path.normpath(out)) \
        else ""
    cks = glob.glob(f"{out}/cache/ckpt_nuts_*.npz")
    if not cks:
        sys.exit(f"no checkpoint under {out}/cache")
    # newest by mtime: sorted-by-name can pick a stale checkpoint from
    # an older config hash (ADVICE r4)
    ck = max(cks, key=os.path.getmtime)
    with np.load(ck, allow_pickle=False) as z:
        if "qs" not in z.files or int(z.get("done", 0)) == 0:
            wdone = int(z["wdone"]) if "wdone" in z.files else 0
            sys.exit(f"{ck}: still in warmup (wdone={wdone}); no draws "
                     "to harvest yet")
        qs, div, done = z["qs"], z["div"], int(z["done"])
    chains = qs.shape[0]
    samples = np.exp(qs.reshape(-1, len(FIT_NAMES)))
    print(f"checkpoint: {chains} chains x {done} draws, "
          f"{int(div.sum())} divergences")

    with open(f"{out}/posterior_samples{tag}.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(list(FIT_NAMES) + ["weight"])
        w.writerows([[*s, 1.0] for s in samples])
    qrows = []
    for j, n in enumerate(FIT_NAMES):
        q = np.quantile(samples[:, j], QS)
        qrows.append([n] + list(q) + [samples[:, j].mean()])
        print(f"  {n}: median {q[2]:.4g} [{q[0]:.4g}, {q[4]:.4g}]")
    with open(f"{out}/posterior_quantiles{tag}.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["param"] + [f"q{q}" for q in QS] + ["mean"])
        w.writerows(qrows)
    total = int(os.environ.get("NUTS_TOTAL_DRAWS", qs.shape[1]))
    with open(f"{out}/run.log", "w") as f:
        f.write(f"harvested mid-run checkpoint: {chains} chains x "
                f"{done} draws (target >= {total}), "
                f"{int(div.sum())} divergences\n"
                f"(resumable: rerun scripts/run_exact_nuts_r4.sh to "
                f"continue from {done})\n")
    print(f"wrote {out}/posterior_{{samples,quantiles}}.csv")

    # Health gate over the partial draws, with the REAL per-draw
    # divergence flags (the committed-CSV retrofit in
    # scripts/gen_nuts_diagnostics.py can only report NaN there).
    # Same CSV format as fit_and_infer's post-run writer.
    diag = _load_diagnostics()
    report = diag.check_chains(qs, div, names=list(FIT_NAMES))
    with open(f"{out}/nuts_diagnostics{tag}.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["param", "rhat", "ess"])
        w.writerows([[n, report["rhat"][n], report["ess"][n]]
                     for n in FIT_NAMES])
        w.writerow(["_divergence_rate", report["divergence_rate"], ""])
        w.writerow(["_ok", int(report["ok"]), ""])
    status = "ok" if report["ok"] else "FAILED: " + "; ".join(
        report["failures"])
    print(f"health gate ({chains} chains x {done}): {status}")

    if os.path.exists(f"{sur_dir}/posterior_quantiles{tag}.csv"):
        subprocess.run([sys.executable,
                        "scripts/compare_exact_vs_surrogate.py",
                        out, sur_dir, tag], check=True)


if __name__ == "__main__":
    main()
