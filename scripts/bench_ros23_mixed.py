"""Measure ros23 f64-state + f32 linear algebra at the GSA production
config (rtol 1e-4, the ``define_PDESystem_base.jl:288`` ensemble
tolerance).

Rationale: a Rosenbrock-W method keeps its order with a perturbed W as
long as the three stage solves use the same W̃; an f32 factorization is
exactly that (W̃ = W + O(1e-7)).  With ls_dtype-native bands the whole
linear-algebra block (JVPs, factor, 3 solves) then runs in f32 while
the RHS/state stay f64 — on TPU f64 is emulated, so this should
recover most of the f32 path's speed at f64 trajectory accuracy.

Comparison points: ros23 full-f64 (the GSA production config, ~235
solves/s in round 2) and the f32 ros23 headline.
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

    # tight f64 anchor for accuracy (first chunk only, reused ref)
    ref, *_ = run(batch, Co64, rtol=1e-8, atol=1e-11, method="trbdf2")

    cases = (
        ("ros23-full-f64", dict(rtol=1e-4, atol=1e-7,
                                method="rosenbrock23")),
        ("ros23-f64+f32ls", dict(rtol=1e-4, atol=1e-7,
                                 method="rosenbrock23",
                                 linsolve_dtype=jnp.float32)),
        ("trbdf2-f64+f32ls rtol1e-4", dict(rtol=1e-4, atol=1e-7,
                                           method="trbdf2",
                                           linsolve_dtype=jnp.float32)),
    )
    for name, kw in cases:
        out, nacc, nrej, failed = run(batch, Co64, **kw)  # compile+warm
        t0 = time.time()
        out, nacc, nrej, failed = run(batch, Co64, **kw)
        wall = time.time() - t0
        rel = np.nanmax(np.abs(out - ref) / (np.abs(ref) + 1e-8))
        print(f"{name}: {wall:.3f}s -> {(N - failed)/wall:.1f} solves/s  "
              f"acc={nacc} rej={nrej} failed={failed}  "
              f"max rel err vs f64-rtol1e-8: {rel:.3g}", flush=True)


if __name__ == "__main__":
    main()
