"""Measure the double-single (jvp-corrected two-f32) RHS on the f64
configs (VERDICT-r3 item 2).

The round-3 step profile (scripts/profile_step_components.py) showed
the f64+f32ls RODAS4 step is 58% emulated-f64 RHS (6x77 us at B=256).
``rhs_mixed=True`` replaces each emulated-f64 RHS evaluation with one
native-f32 jvp pair at an exactly-split (hi, lo) state
(ops/batch_stiff.py run_leg), targeting >=1.5x on the north star at
unchanged rtol-1e-6 agreement (err <= ~1e-6 vs f64 rtol 1e-8).

Measures: north star (f64 rodas4 + f32 ls, rtol 1e-6) and the GSA
recipe (same, rtol 1e-4), each with rhs_mixed on/off, plus per-path
max rel err vs an rtol-1e-8 full-f64 anchor on chunk 0.
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

    # accuracy anchor: tight f64 reference on chunk 0
    ref, *_ = run(batch[:CHUNK], Co64, rtol=1e-8, atol=1e-11,
                  method="rodas4")

    cfgs = []
    for label, rtol, atol in (("north-star rtol1e-6", 1e-6, 1e-9),
                              ("gsa rtol1e-4", 1e-4, 1e-7)):
        for mixed in (False, True):
            cfgs.append((f"{label} rhs_mixed={mixed}",
                         dict(rtol=rtol, atol=atol, method="rodas4",
                              linsolve_dtype=jnp.float32,
                              rhs_mixed=mixed)))

    for name, kw in cfgs:
        out, nacc, nrej, failed = run(batch, Co64, **kw)  # compile+warm
        t0 = time.time()
        out, nacc, nrej, failed = run(batch, Co64, **kw)
        wall = time.time() - t0
        rel = np.nanmax(np.abs(out[:CHUNK] - ref) / (np.abs(ref) + 1e-8))
        print(f"{name}: {wall:.3f}s -> {(N - failed)/wall:.1f} solves/s  "
              f"acc={nacc} rej={nrej} failed={failed}  "
              f"relerr_vs_f64rtol1e-8={rel:.3g}", flush=True)


if __name__ == "__main__":
    main()
