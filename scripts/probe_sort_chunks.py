"""Probe: does cost-sorted chunking pay for *posterior* stiff ensembles?

The GSA runner sorts its samples by a stiffness proxy (sum of kinetic
rates) because over x1000 log-space bounds a random 256-chunk costs its
stiffest member.  Posterior/prior ensembles are far narrower (~1 decade
per parameter), so the win is not obvious — this probe measures it:

  1. per-lane accepted+rejected step counts over a realistic
     generate_ensemble() batch (f32 rodas4, dr=0.2, tf=5, rtol 1e-4),
  2. how well the sum-of-rates proxy predicts the step count,
  3. measured wall clock of the same N solved in random-order chunks
     vs proxy-sorted chunks vs oracle (true step count) sorted chunks.

Run on the TPU: python -u scripts/probe_sort_chunks.py
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

N = 2048
CHUNK = 256


def main():
    system = g.base_system()
    Co = g.default_co().astype(jnp.float32)

    chain = load_chain_csv(REFERENCE_CHAIN)
    ens = generate_ensemble(chain, n=N, rng=np.random.default_rng(0))
    batch = np.asarray(ens, np.float32)

    def run_chunks(pbatch, order):
        walls = []
        steps = np.zeros(len(order), np.int64)
        for s in range(0, N, CHUNK):
            idx = order[s:s + CHUNK]
            pb = Params.unpack(jnp.asarray(pbatch[idx]))
            t0 = time.time()
            sol, stats = solve_stiff_batch(system, Co, pb, dr=0.2, tf=5.0,
                                           Nts=2, rtol=1e-4, atol=1e-7,
                                           method="rodas4",
                                           return_stats=True)
            jax.block_until_ready(sol.C)
            walls.append(time.time() - t0)
            steps[idx] = np.asarray(stats.n_accepted + stats.n_rejected)
        return np.array(walls), steps

    rng = np.random.default_rng(0)
    rand_order = rng.permutation(N)

    # warmup/compile
    run_chunks(batch, rand_order)

    w_rand, steps = run_chunks(batch, rand_order)
    proxy = batch[:, 7:].sum(axis=1)
    corr = np.corrcoef(proxy, steps)[0, 1]
    w_proxy, _ = run_chunks(batch, np.argsort(proxy))
    w_oracle, _ = run_chunks(batch, np.argsort(steps))
    # second random pass to bound run-to-run noise
    w_rand2, _ = run_chunks(batch, rng.permutation(N))

    q = np.quantile(steps, [0.0, 0.5, 0.9, 0.99, 1.0])
    print(f"steps per lane: min/med/p90/p99/max = {q.astype(int)}")
    print(f"proxy(sum k) vs steps: r = {corr:.3f}")
    print(f"chunk max steps, random: "
          f"{[int(steps[rand_order[s:s+CHUNK]].max()) for s in range(0, N, CHUNK)]}")
    so = np.argsort(steps)
    print(f"chunk max steps, oracle: "
          f"{[int(steps[so[s:s+CHUNK]].max()) for s in range(0, N, CHUNK)]}")
    for name, w in [("random", w_rand), ("random2", w_rand2),
                    ("proxy-sorted", w_proxy), ("oracle-sorted", w_oracle)]:
        print(f"{name:14s}: total {w.sum():7.3f} s  "
              f"({N / w.sum():7.1f} solves/s)  chunks {np.round(w, 3)}")


if __name__ == "__main__":
    main()
