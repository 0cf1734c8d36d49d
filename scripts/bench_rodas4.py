"""Measure the order-4 Rosenbrock (RODAS4) against the round-3 defaults
at all three bench configurations.

Hypothesis: step count scales ~ tol^(-1/(p+1)); on CPU at dr=0.2 rodas4
takes 2.7x fewer steps than ros23 at rtol 1e-4 (and is 3x more
accurate) and 2.4x fewer than TRBDF2 at the rtol 1e-6 north star (and
20x more accurate), at ~2x the per-step solve count — so a net win is
expected everywhere, largest at the north star where it also removes
the Newton while_loop's lane synchronization.

Configs measured (all N=1024, chunks of 256, dr=0.2, tf=5):
  headline  : f32, rtol 1e-4     — ros23 vs rodas4
  gsa       : f64+f32ls, rtol 1e-4 — ros23 vs rodas4
  north star: f64+f32ls, rtol 1e-6 — trbdf2 vs rodas4
"""
import time

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gab1_shp2_tpu as g
from gab1_shp2_tpu.models.params import Params

N = 1024
CHUNK = 256


def run(batch, Co, **kw):
    outs, nacc, nrej, failed = [], 0, 0, 0
    for s in range(0, N, CHUNK):
        p = Params.unpack(jnp.asarray(batch[s:s + CHUNK], Co.dtype))
        sol, st = g.solve_stiff_batch(g.base_system(), Co, p, dr=0.2,
                                      tf=5.0, Nts=2, return_stats=True,
                                      **kw)
        outs.append(np.asarray(sol.C[:, -1], np.float64))
        nacc += int(np.asarray(st.n_accepted).sum())
        nrej += int(np.asarray(st.n_rejected).sum())
        failed += int(np.asarray(st.failed).sum())
    return np.concatenate(outs), nacc, nrej, failed


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    p0 = np.asarray(g.default_params().pack())
    batch = p0[None, :] * np.exp(rng.normal(0.0, 0.10, size=(N, 24)))
    batch[:, 21] = p0[21]
    Co64 = g.default_co()
    Co32 = Co64.astype(jnp.float32)

    ref, *_ = run(batch, Co64, rtol=1e-8, atol=1e-11, method="trbdf2")

    cases = (
        ("headline ros23-f32", Co32,
         dict(rtol=1e-4, atol=1e-7, method="rosenbrock23")),
        ("headline rodas4-f32", Co32,
         dict(rtol=1e-4, atol=1e-7, method="rodas4")),
        ("gsa ros23-f64+f32ls", Co64,
         dict(rtol=1e-4, atol=1e-7, method="rosenbrock23",
              linsolve_dtype=jnp.float32)),
        ("gsa rodas4-f64+f32ls", Co64,
         dict(rtol=1e-4, atol=1e-7, method="rodas4",
              linsolve_dtype=jnp.float32)),
        ("northstar trbdf2-f64+f32ls", Co64,
         dict(rtol=1e-6, atol=1e-9, method="trbdf2",
              linsolve_dtype=jnp.float32)),
        ("northstar rodas4-f64+f32ls", Co64,
         dict(rtol=1e-6, atol=1e-9, method="rodas4",
              linsolve_dtype=jnp.float32)),
    )
    for name, Co, kw in cases:
        out, nacc, nrej, failed = run(batch, Co, **kw)  # compile+warm
        t0 = time.time()
        out, nacc, nrej, failed = run(batch, Co, **kw)
        wall = time.time() - t0
        rel = np.nanmax(np.abs(out - ref) / (np.abs(ref) + 1e-8))
        print(f"{name}: {wall:.3f}s -> {(N - failed)/wall:.1f} solves/s  "
              f"acc={nacc} rej={nrej} failed={failed}  "
              f"max rel err vs f64-rtol1e-8: {rel:.3g}", flush=True)


if __name__ == "__main__":
    main()
