"""Probe: can the GSA production recipe (f64 Rosenbrock, rtol 1e-4) run
its linear algebra in f32 at the x1000-bounds corners?

Usage: python scripts/probe_gsa_mixed.py [method]   (default rodas4;
2026-08-17 validated rosenbrock23, 2026-08-18 rodas4.)

Samples the eFAST search-curve distribution (the same log-bounds design
the production drivers use) plus the 2^k-style extreme corners of the
four most sensitive parameters, and compares full-f64 vs
f64+f32-linsolve outputs and failure/drop counts.
"""
import time

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gab1_shp2_tpu as g
from gab1_shp2_tpu.gsa.runner import dk_bounds
from gab1_shp2_tpu.models.observables import gsa_outputs
from gab1_shp2_tpu.models.params import Params

CHUNK = 256
METHOD = sys.argv[1] if len(sys.argv) > 1 else "rodas4"


def run(batch, Co, **kw):
    outs, failed = [], []
    N = batch.shape[0]
    for s in range(0, N, CHUNK):
        b = batch[s:s + CHUNK]
        pad = CHUNK - b.shape[0]
        if pad:
            b = np.concatenate([b, np.repeat(b[-1:], pad, 0)], 0)
        p = Params.unpack(jnp.asarray(b, Co.dtype))
        sol, st = g.solve_stiff_batch(g.base_system(), Co, p, dr=0.2,
                                      tf=5.0, Nts=2, rtol=1e-4, atol=1e-7,
                                      method=METHOD,
                                      max_steps=2500,
                                      return_stats=True, **kw)
        out = np.asarray(gsa_outputs(sol, 10.0), np.float64)
        bad = np.asarray(st.failed) | ~np.isfinite(out).all(axis=-1)
        outs.append(out[:CHUNK - pad] if pad else out)
        failed.append(bad[:CHUNK - pad] if pad else bad)
    return np.concatenate(outs), np.concatenate(failed)


def main():
    print("devices:", jax.devices(), flush=True)
    bounds = np.asarray(dk_bounds(g.default_params()), np.float64)
    lo, hi = np.log(bounds[:, 0]), np.log(bounds[:, 1])
    npar = len(lo)

    rng = np.random.default_rng(7)
    # 1) uniform log-space draws over the full eFAST box
    box = np.exp(rng.uniform(lo, hi, size=(768, npar)))
    # 2) extreme corners: all 2^4 sign combinations of the four stiffest
    #    rate params at full ±3-decade excursion, others at baseline
    p0 = np.asarray(g.default_params().pack())
    stiff_idx = [13, 14, 15, 16]  # kG1p, kG1dp, kSa, kSi (packed D0-6,k7-23)
    corners = []
    for signs in itertools.product((0, 1), repeat=4):
        c = p0.copy()
        for j, sgn in zip(stiff_idx, signs):
            c[j] = bounds[j, 1] if sgn else bounds[j, 0]
        corners.append(c)
    corners = np.asarray(corners)
    batch = np.concatenate([box, corners], 0)
    Co = g.default_co()

    out64, fail64 = run(batch, Co)
    t0 = time.time(); out64, fail64 = run(batch, Co); w64 = time.time() - t0
    outmx, failmx = run(batch, Co, linsolve_dtype=jnp.float32)
    t0 = time.time()
    outmx, failmx = run(batch, Co, linsolve_dtype=jnp.float32)
    wmx = time.time() - t0

    n = batch.shape[0]
    print(f"full-f64: {int(fail64.sum())}/{n} failed, {w64:.2f}s "
          f"({(n - fail64.sum())/w64:.0f} solves/s)")
    print(f"mixed   : {int(failmx.sum())}/{n} failed, {wmx:.2f}s "
          f"({(n - failmx.sum())/wmx:.0f} solves/s)")
    both = ~(fail64.astype(bool) | failmx.astype(bool))
    a, b = out64[both], outmx[both]
    denom = np.abs(a) + 1e-8
    rel = np.abs(a - b) / denom
    print(f"agree on {int(both.sum())} common-ok lanes: "
          f"max rel {np.nanmax(rel):.3g}, "
          f"p99 rel {np.nanpercentile(rel, 99):.3g}")
    only64 = int((~fail64.astype(bool) & failmx.astype(bool)).sum())
    onlymx = int((fail64.astype(bool) & ~failmx.astype(bool)).sum())
    print(f"lanes ok in f64 but failed in mixed: {only64}; "
          f"ok in mixed but failed in f64: {onlymx}")
    corner_sl = slice(768, None)
    print(f"corner failures f64: {int(fail64[corner_sl].sum())}/16, "
          f"mixed: {int(failmx[corner_sl].sum())}/16")


if __name__ == "__main__":
    main()
