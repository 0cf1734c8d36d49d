"""Shared infrastructure for the workload drivers.

Each reference analysis script (``run_base_model.jl`` and friends,
SURVEY.md section 2.5) has a workload module here; this module holds
the shared pieces: ensemble acquisition, median/credible-interval
summary surfaces, and figure/CSV output.
"""

from __future__ import annotations

import argparse
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: TPU compiles tunnel to a remote server and
# take minutes cold; warm-cache recompiles are seconds
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.dirname(os.path.abspath(__file__)))),
                      ".jax_cache"))

from gab1_shp2_tpu.ensemble.engine import masked_quantiles, run_ensemble
from gab1_shp2_tpu.models.params import load_ensemble_csv

REFERENCE_ENSEMBLE = "/root/reference/Julia/parameter_ensemble.csv"
REFERENCE_CHAIN = ("/root/reference/Julia/Turing results/"
                   "Turing_res_5-chains_1000-spls_posteriors.csv")


class _ForceCPU(argparse.Action):
    """``--cpu``: pin this process to the CPU backend.  Must take
    effect before any computation; the axon TPU plugin auto-registers
    and ignores ``JAX_PLATFORMS`` from the environment, so this is the
    only reliable switch.  Useful for latency-bound stages (e.g. the
    serial LBFGS refinement in the MAP fit) that would trip the TPU
    runtime's ~60 s single-execution watchdog."""

    def __call__(self, parser, namespace, values, option_string=None):
        jax.config.update("jax_platforms", "cpu")
        setattr(namespace, self.dest, True)


def default_argparser(desc: str) -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=desc)
    ap.add_argument("--cpu", nargs=0, action=_ForceCPU, default=False,
                    help="run on the CPU backend (see _ForceCPU)")
    ap.add_argument("--n", type=int, default=200,
                    help="ensemble size (reference defaults are 1000-5000)")
    ap.add_argument("--dr", type=float, default=0.2)
    ap.add_argument("--tf", type=float, default=5.0)
    ap.add_argument("--nts", type=int, default=100)
    ap.add_argument("--rtol", type=float, default=1e-4)
    ap.add_argument("--solver", choices=("stiff", "explicit"),
                    default="stiff")
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--linsolve", choices=("none", "f32", "bf16"),
                    default="none",
                    help="mixed-precision W-factors for the stiff "
                         "solver (f32/bf16 are exact for TRBDF2's "
                         "Newton iteration and avoid emulated-f64 "
                         "linear algebra on TPU)")
    ap.add_argument("--outdir", default="images")
    ap.add_argument("--seed", type=int, default=0)
    return ap


def linsolve_dtype(args):
    """Map the --linsolve flag to a dtype (or None)."""
    return {"none": None, "f32": jnp.float32,
            "bf16": jnp.bfloat16}[args.linsolve]


def get_ensemble(n: int, seed: int = 0) -> np.ndarray:
    """Parameter ensemble: subsample the reference's shipped CSV when
    available (exact parity), else generate from chain+priors
    (``get_param_posteriors.jl:38-86``)."""
    rng = np.random.default_rng(seed)
    if os.path.exists(REFERENCE_ENSEMBLE):
        ens = load_ensemble_csv(REFERENCE_ENSEMBLE)
        idx = rng.choice(len(ens), size=min(n, len(ens)), replace=False)
        return ens[idx]
    from gab1_shp2_tpu.priors.posteriors import generate_ensemble, load_chain_csv

    chain = None
    if os.path.exists(REFERENCE_CHAIN):
        chain = load_chain_csv(REFERENCE_CHAIN)
    return generate_ensemble(chain, n=n, rng=rng)


def summary_surfaces(system, Co, ensemble, extract: Callable, *,
                     qs=(0.159, 0.5, 0.841), **kw):
    """Run the ensemble and return per-(whatever extract emits)
    quantile summaries, mirroring the median/68%-CI surfaces of
    ``run_base_model.jl:99-175``."""
    out, ok = run_ensemble(system, Co, ensemble, extract=extract, **kw)
    return np.asarray(masked_quantiles(out, ok, qs=qs)), int(ok.sum())


def save_csv(path: str, header, rows) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    import csv

    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(header)
        w.writerows(rows)


def save_surface_plot(path: str, r, t, surface, title: str,
                      zlabel: str) -> None:
    """3-D surface figure standing in for the reference's Makie plots
    (``run_base_model.jl:198-253``)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(7, 5))
    ax = fig.add_subplot(111, projection="3d")
    T, Rg = np.meshgrid(t, r)
    ax.plot_surface(Rg, T, surface, cmap="viridis", linewidth=0)
    ax.set_xlabel("r (um)")
    ax.set_ylabel("t (min)")
    ax.set_zlabel(zlabel)
    ax.set_title(title)
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)


def save_line_plot(path: str, x, ys: dict, xlabel: str, ylabel: str,
                   title: str, bands: Optional[dict] = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    for label, y in ys.items():
        ax.plot(x, y, label=label)
    if bands:
        for label, (lo, hi) in bands.items():
            ax.fill_between(x, lo, hi, alpha=0.25, label=label)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    ax.legend(fontsize=8)
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)
