"""Measure pilot-fit cost-sorted chunking end-to-end through
ensemble.run_ensemble on realistic posterior ensembles.

Each timed call uses a *fresh* ensemble draw (different seed) so no
layer can reuse results; three repeats per schedule.

Run on the TPU: python -u scripts/bench_cost_sorted.py
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
from gab1_shp2_tpu.ensemble.engine import run_ensemble
from gab1_shp2_tpu.priors.posteriors import generate_ensemble, load_chain_csv
from gab1_shp2_tpu.workloads.common import REFERENCE_CHAIN

N = 2048


def _extract(s):
    return s.PG1Stot[-1]


def main():
    system = g.base_system()
    Co = g.default_co().astype(jnp.float32)
    chain = load_chain_csv(REFERENCE_CHAIN)
    batches = [jnp.asarray(
        generate_ensemble(chain, n=N, rng=np.random.default_rng(seed)),
        jnp.float32) for seed in range(4)]

    kw = dict(solver="stiff", dr=0.2, tf=5.0, Nts=2, rtol=1e-4, atol=1e-7,
              method="rodas4", chunk=256, extract=_extract)

    def timed(tag, **extra):
        out, ok = run_ensemble(system, Co, batches[0], **kw, **extra)  # warm
        jax.block_until_ready(out)
        for i, b in enumerate(batches[1:], 1):
            t0 = time.time()
            out, ok = run_ensemble(system, Co, b, **kw, **extra)
            jax.block_until_ready(out)
            dt = time.time() - t0
            nok = int(np.asarray(ok).sum())
            print(f"{tag:22s} batch{i}: {dt:7.3f} s  {nok / dt:7.1f} "
                  f"solves/s ({nok}/{N} ok)")
        return np.asarray(out)

    a = timed("in-order (reuse flag)", jac_reuse=True)
    b = timed("cost-sorted (default)")
    assert np.array_equal(a, b), "schedules disagree"
    print("outputs bitwise equal")


if __name__ == "__main__":
    main()
