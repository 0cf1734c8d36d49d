"""Collect per-lane step counts for a posterior ensemble and find a
cheap predictor (for cost-sorted chunking of stiff ensembles).

Saves (params, steps) to /tmp/steps_probe.npz, then fits candidate
predictors offline.  Run on the TPU: python -u scripts/probe_step_predictors.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import gab1_shp2_tpu as g
from gab1_shp2_tpu.models.params import Params
from gab1_shp2_tpu.ops.batch_stiff import solve_stiff_batch
from gab1_shp2_tpu.priors.posteriors import generate_ensemble, load_chain_csv
from gab1_shp2_tpu.workloads.common import REFERENCE_CHAIN
from gab1_shp2_tpu.models.species import PNAMES

N = 2048
CHUNK = 256


def main():
    system = g.base_system()
    Co = g.default_co().astype(jnp.float32)
    chain = load_chain_csv(REFERENCE_CHAIN)
    batch = np.asarray(
        generate_ensemble(chain, n=N, rng=np.random.default_rng(0)),
        np.float32)

    steps = np.zeros(N, np.int64)
    for s in range(0, N, CHUNK):
        pb = Params.unpack(jnp.asarray(batch[s:s + CHUNK]))
        sol, stats = solve_stiff_batch(system, Co, pb, dr=0.2, tf=5.0,
                                       Nts=2, rtol=1e-4, atol=1e-7,
                                       method="rodas4", return_stats=True)
        steps[s:s + CHUNK] = np.asarray(stats.n_accepted + stats.n_rejected)
    np.savez("/tmp/steps_probe.npz", params=batch, steps=steps)

    X = np.log(batch)
    y = np.log(steps.astype(np.float64))
    names = list(PNAMES)
    print("per-param |r| with log steps:")
    rs = []
    for j, nm in enumerate(names):
        if np.std(X[:, j]) < 1e-12:
            rs.append(0.0)
            continue
        r = np.corrcoef(X[:, j], y)[0, 1]
        rs.append(r)
    for j in np.argsort(-np.abs(rs))[:8]:
        print(f"  {names[j]:8s} r={rs[j]:+.3f}")

    # full linear model in log space
    keep = [j for j in range(X.shape[1]) if np.std(X[:, j]) > 1e-12]
    A = np.column_stack([X[:, keep], np.ones(N)])
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    pred = A @ coef
    ss = 1 - np.var(y - pred) / np.var(y)
    print(f"linear log-log model R^2 = {ss:.3f}, "
          f"rank corr = {np.corrcoef(pred, y)[0, 1]:.3f}")
    top = np.argsort(-np.abs(coef[:-1]))[:8]
    for t in top:
        print(f"  coef {names[keep[t]]:8s} {coef[t]:+.3f}")

    # chunk-max analysis: how close does the model get to oracle?
    def total_max(order):
        return sum(int(steps[order[s:s + CHUNK]].max())
                   for s in range(0, N, CHUNK))

    rng = np.random.default_rng(1)
    print(f"sum of chunk-max steps: random {total_max(rng.permutation(N))}, "
          f"model {total_max(np.argsort(pred))}, "
          f"oracle {total_max(np.argsort(steps))}")


if __name__ == "__main__":
    main()
