"""Measure the PI (Gustafsson) step controller vs the standard
asymptotic controller at the bench configuration (VERDICT r2 item 8).

Reports wall clock, solves/s, and total accepted/rejected step counts
for both headline paths:

  * f32 rosenbrock23, rtol 1e-4 (fused Pallas step on TPU)
  * f64 TRBDF2 + f32 linsolve, rtol 1e-6 (north star, jac_reuse)

Ensemble: bench.py's exact perturbed-baseline batch (N=1024,
sigma=0.10, EGF fixed).
"""
import time

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

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
    Co32 = Co64.astype(jnp.float32)

    cfgs = [
        ("f32-ros23", Co32, dict(rtol=1e-4, atol=1e-7,
                                 method="rosenbrock23")),
        ("f64-trbdf2-ns", Co64, dict(rtol=1e-6, atol=1e-9,
                                     method="trbdf2",
                                     linsolve_dtype=jnp.float32)),
    ]
    for name, Co, kw in cfgs:
        ref = None
        for controller in ("standard", "pi"):
            t0 = time.time()
            out, nacc, nrej, failed = run(batch, Co, controller=controller,
                                          **kw)
            first = time.time() - t0
            t0 = time.time()
            out, nacc, nrej, failed = run(batch, Co, controller=controller,
                                          **kw)
            wall = time.time() - t0
            print(f"{name} {controller}: {wall:.3f}s -> "
                  f"{(N - failed)/wall:.1f} solves/s  acc={nacc} "
                  f"rej={nrej} failed={failed} (first {first:.1f}s)",
                  flush=True)
            if ref is None:
                ref = out
            else:
                rel = np.nanmax(np.abs(out - ref) / (np.abs(ref) + 1e-6))
                print(f"  pi vs standard max rel diff: {rel:.3g}",
                      flush=True)


if __name__ == "__main__":
    main()
