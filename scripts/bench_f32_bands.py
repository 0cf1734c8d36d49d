"""Measure the ls_dtype-native Jacobian band computation on the f64
north-star config (f64 TRBDF2 + f32 linsolve, rtol 1e-6, jac_reuse).

Comparison point: the standard-controller rows of the round-3 PI bench
at the identical config/ensemble (f64-trbdf2-ns standard: 201.7
solves/s with stats; f32-ros23 923.1/s), and bench.py's recorded 243.4
(north star, no stats).
"""
import time

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

import sys, os
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
        outs.append(np.asarray(sol.C[:, -1]))
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

    # accuracy anchor: tight f64 reference on the first chunk
    kw_ns = dict(rtol=1e-6, atol=1e-9, method="trbdf2",
                 linsolve_dtype=jnp.float32)
    for name, kw in (("f64-trbdf2-ns(f32 bands)", kw_ns),
                     ("f64-trbdf2-full-f64", dict(rtol=1e-6, atol=1e-9,
                                                  method="trbdf2"))):
        out, nacc, nrej, failed = run(batch, Co64, **kw)  # compile+warm
        t0 = time.time()
        out, nacc, nrej, failed = run(batch, Co64, **kw)
        wall = time.time() - t0
        print(f"{name}: {wall:.3f}s -> {(N - failed)/wall:.1f} solves/s  "
              f"acc={nacc} rej={nrej} failed={failed}", flush=True)
        if name.startswith("f64-trbdf2-ns"):
            mixed = out
        else:
            rel = np.nanmax(np.abs(mixed - out) / (np.abs(out) + 1e-6))
            print(f"  mixed vs full-f64 max rel diff: {rel:.3g}", flush=True)


if __name__ == "__main__":
    main()
