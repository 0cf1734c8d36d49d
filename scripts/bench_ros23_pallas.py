"""Measure the fused Pallas ros23 step vs the XLA step on the TPU.

Headline config: f32 rosenbrock23, dr=0.2, tf=5, rtol 1e-4, chunks of
256 lanes (bench.py configuration).
"""
import time

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

import gab1_shp2_tpu as g
from gab1_shp2_tpu.models.params import Params


def run(step_impl, batch, Co, chunk=256, **kw):
    outs, stats = [], []
    for s in range(0, batch.shape[0], chunk):
        p = Params.unpack(batch[s:s + chunk])
        sol, st = g.solve_stiff_batch(g.base_system(), Co, p,
                                      step_impl=step_impl,
                                      return_stats=True, **kw)
        outs.append(np.asarray(sol.C[:, -1]))
        stats.append(np.asarray(st.failed))
    return np.concatenate(outs), np.concatenate(stats)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    N = 1024
    p0 = np.asarray(g.default_params().pack())
    batch = jnp.asarray(p0[None, :] * np.exp(rng.normal(0, 0.3, (N, 24))),
                        jnp.float32)
    Co = jnp.asarray(g.default_co(), jnp.float32)
    kw = dict(dr=0.2, tf=5.0, Nts=2, rtol=1e-4, atol=1e-7,
              method="rosenbrock23")

    for impl in ("xla", "pallas"):
        t0 = time.time()
        out, failed = run(impl, batch, Co, **kw)
        compile_s = time.time() - t0
        t0 = time.time()
        out, failed = run(impl, batch, Co, **kw)
        wall = time.time() - t0
        print(f"{impl}: warm wall {wall:.3f}s -> {N/wall:.1f} solves/s "
              f"(first call {compile_s:.1f}s, failed {failed.sum()})",
              flush=True)
        if impl == "xla":
            ref = out
        else:
            rel = np.nanmax(np.abs(out - ref) / (np.abs(ref) + 1e-6))
            print(f"pallas vs xla max rel diff: {rel:.3g}")


if __name__ == "__main__":
    main()
