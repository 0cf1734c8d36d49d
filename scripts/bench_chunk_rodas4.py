"""Chunk-size probe for the RODAS4 production configs.

Round-2 measured ros23-f32 slower at B=1024 single-dispatch than 4x256
(650 vs 1282 solves/s) and the watchdog risk pinned chunking at 256.
RODAS4 takes ~2.7x fewer steps, so the wall per dispatch shrank and the
lane-synchronization penalty of wider batches (the batch finishes when
its slowest lane finishes) may now be the binding term instead of
dispatch overhead.  Measure 256 / 512 / 1024 at the f32 headline and
the GSA (f64+f32ls) configs.
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


def run(batch, Co, chunk, **kw):
    outs = []
    for s in range(0, N, chunk):
        p = Params.unpack(jnp.asarray(batch[s:s + chunk], Co.dtype))
        sol = g.solve_stiff_batch(g.base_system(), Co, p, dr=0.2,
                                  tf=5.0, Nts=2, **kw)
        outs.append(sol.C[:, -1])
    out = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
    out.block_until_ready()
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    p0 = np.asarray(g.default_params().pack())
    batch = p0[None, :] * np.exp(rng.normal(0.0, 0.10, size=(N, 24)))
    batch[:, 21] = p0[21]
    Co64 = g.default_co()
    Co32 = Co64.astype(jnp.float32)

    cases = (
        ("f32 headline", Co32, dict(rtol=1e-4, atol=1e-7, method="rodas4")),
        ("gsa f64+f32ls", Co64, dict(rtol=1e-4, atol=1e-7, method="rodas4",
                                     linsolve_dtype=jnp.float32)),
    )
    for name, Co, kw in cases:
        for chunk in (256, 512, 1024):
            run(batch, Co, chunk, **kw)          # compile + warm
            t0 = time.time()
            run(batch, Co, chunk, **kw)
            wall = time.time() - t0
            print(f"{name} chunk={chunk}: {wall:.3f}s -> "
                  f"{N / wall:.1f} solves/s", flush=True)


if __name__ == "__main__":
    main()
