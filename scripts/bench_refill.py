"""Lane-refill scheduler vs pilot-fit cost-sorted chunking (VERDICT-r3
item 3 measurement).

Two production workloads, run on the TPU:

1. 2048-member posterior ensemble at the headline config (f32 rodas4,
   dr=0.2, tf=5, Nts=2, rtol 1e-4) — the `run_ensemble` path.
2. An eFAST diffs+kinetics corner-box slice (4096 design rows spanning
   the x/÷1000 bounds, max_steps=2000 cap) — the GSA runner path,
   where the heavy tail is worst.

Each timed call uses a fresh ensemble draw / design slice offset so no
layer can cache results; outputs are cross-checked between schedulers.

Run on the TPU: python -u scripts/bench_refill.py
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
from gab1_shp2_tpu.gsa.efast import efast_design
from gab1_shp2_tpu.gsa.runner import dk_bounds, make_param_evaluator
from gab1_shp2_tpu.models.observables import gsa_outputs
from gab1_shp2_tpu.models.params import Params
from gab1_shp2_tpu.ops.batch_stiff import solve_stiff_refill
from gab1_shp2_tpu.priors.posteriors import generate_ensemble, load_chain_csv
from gab1_shp2_tpu.workloads.common import REFERENCE_CHAIN

N = 2048


def _extract(s):
    return s.PG1Stot[-1]


def _extract_gsa(s):
    return gsa_outputs(s, 10.0)


def posterior_bench():
    system = g.base_system()
    Co = g.default_co().astype(jnp.float32)
    chain = load_chain_csv(REFERENCE_CHAIN)
    batches = [jnp.asarray(
        generate_ensemble(chain, n=N, rng=np.random.default_rng(seed)),
        jnp.float32) for seed in range(4)]

    kw = dict(dr=0.2, tf=5.0, Nts=2, rtol=1e-4, atol=1e-7, method="rodas4")

    results = {}

    def timed(tag, fn):
        out = fn(batches[0])  # warm
        jax.block_until_ready(out)
        best = -1.0
        for i, b in enumerate(batches[1:], 1):
            t0 = time.time()
            out = fn(b)
            jax.block_until_ready(out)
            dt = time.time() - t0
            print(f"{tag:28s} batch{i}: {dt:7.3f} s  {N / dt:7.1f} solves/s")
            best = max(best, N / dt)
        results[tag] = (best, np.asarray(out[0]), np.asarray(out[1]))
        return out

    timed("cost-sorted chunk=256", lambda b: run_ensemble(
        system, Co, b, solver="stiff", chunk=256, extract=_extract, **kw))
    for he in (16, 64, 256):
        timed(f"refill lanes=256 K={he}", lambda b, he=he: solve_stiff_refill(
            system, Co, Params.unpack(b), extract=_extract,
            lanes=256, harvest_every=he, **kw)[:2])

    base = results["cost-sorted chunk=256"]
    for tag, (rate, out, ok) in results.items():
        if tag == "cost-sorted chunk=256":
            continue
        assert np.array_equal(ok, base[2]), f"{tag}: ok masks differ"
        d = np.nanmax(np.abs(out[ok] - base[1][ok])
                      / (np.abs(base[1][ok]) + 1e-8))
        print(f"{tag:28s} vs sorted: max rel diff {d:.2e}, "
              f"speedup x{rate / base[0]:.3f}")


def gsa_corner_bench():
    system = g.base_system()
    Co = g.default_co().astype(jnp.float32)
    p_map = g.default_params(fit="map")
    bounds = dk_bounds(p_map)
    design = efast_design(bounds, 171, num_harmonics=4, log_space=True,
                          rng=np.random.default_rng(123))
    X = np.asarray(design.X, np.float32)  # (24*171 rounded, 24)
    print(f"eFAST slice: {X.shape[0]} samples")
    slices = [X[i::4] for i in range(4)]  # 4 interleaved ~1/4 slices

    kw = dict(dr=0.2, tf=5.0, rtol=1e-4, atol=1e-7, method="rodas4",
              max_steps=2000)
    ev_sorted = make_param_evaluator(system, Co, chunk=256, **kw)

    def ev_refill(Xs, he):
        out, ok, _ = solve_stiff_refill(
            system, Co, Params.unpack(jnp.asarray(Xs)), extract=_extract_gsa,
            Nts=2, lanes=256, harvest_every=he, **kw)
        return np.where(np.asarray(ok)[:, None], np.asarray(out), 0.0)

    results = {}

    def timed(tag, fn):
        out = fn(slices[0])  # warm
        best = -1.0
        for i, s in enumerate(slices[1:], 1):
            t0 = time.time()
            out = fn(s)
            dt = time.time() - t0
            print(f"{tag:28s} slice{i}: {dt:7.3f} s  "
                  f"{s.shape[0] / dt:7.1f} solves/s")
            best = max(best, s.shape[0] / dt)
        results[tag] = (best, out)
        return out

    timed("cost-sorted chunk=256", ev_sorted)
    for he in (16, 64):
        timed(f"refill lanes=256 K={he}", lambda s, he=he: ev_refill(s, he))

    base = results["cost-sorted chunk=256"]
    for tag, (rate, out) in results.items():
        if tag == "cost-sorted chunk=256":
            continue
        both = (np.abs(out).sum(1) > 0) & (np.abs(base[1]).sum(1) > 0)
        d = np.nanmax(np.abs(out[both] - base[1][both])
                      / (np.abs(base[1][both]) + 1e-6))
        ndrop = int((np.abs(out).sum(1) == 0).sum())
        ndrop_b = int((np.abs(base[1]).sum(1) == 0).sum())
        print(f"{tag:28s} vs sorted: max rel diff {d:.2e} on shared-ok, "
              f"drops {ndrop} vs {ndrop_b}, speedup x{rate / base[0]:.3f}")


if __name__ == "__main__":
    print("=== posterior 2048, f32 rodas4 production config ===")
    posterior_bench()
    print("=== eFAST dk corner box, max_steps=2000 ===")
    gsa_corner_bench()
