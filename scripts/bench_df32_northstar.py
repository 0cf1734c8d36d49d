"""North-star A/B: native emulated-f64 RHS vs compensated df32 RHS.

VERDICT-r4 item 6 decision bench.  The f64 rodas4 + f32-linsolve
rtol-1e-6 north star is measured RHS-bound (58% of step wall in the 6
emulated-f64 RHS evals, scripts/profile_step_components.py); the
``rhs_mixed="df32"`` option evaluates the RHS in error-free-transform
double-f32 (~2^-48 accurate, ops/rhs_df32.py) instead.  This times the
bench.py north-star row both ways and reports per-path global error vs
a tight f64 reference — the gate is BOTH >=20% throughput AND error
staying in the native path's accuracy class (~1e-6).

Run on the TPU: python -u scripts/bench_df32_northstar.py [N]
"""

import sys
import time

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import gab1_shp2_tpu as g
from gab1_shp2_tpu.models.params import Params
from gab1_shp2_tpu.ops.batch_stiff import solve_stiff_refill

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
CHUNK = 256

system = g.base_system()
Co64 = g.default_co()
rng = np.random.default_rng(0)
p0 = np.asarray(g.default_params().pack())
batch = p0[None, :] * np.exp(rng.normal(0.0, 0.10, size=(N, 24)))
batch[:, 21] = p0[21]
pb = Params.unpack(jnp.asarray(batch))


def _final_C(sol):
    # refill extract sees a per-member Solution: C is (Nts+1, species,
    # nodes) -> final-time full profile
    return sol.C[-1]


def timed(tag, **kw):
    out, ok, _ = solve_stiff_refill(system, Co64, pb, extract=_final_C,
                                    dr=0.2, tf=5.0, Nts=2, lanes=CHUNK,
                                    rtol=1e-6, atol=1e-9, method="rodas4",
                                    linsolve_dtype=jnp.float32, **kw)
    float(jnp.sum(out))
    t0 = time.time()
    out, ok, _ = solve_stiff_refill(system, Co64, pb, extract=_final_C,
                                    dr=0.2, tf=5.0, Nts=2, lanes=CHUNK,
                                    rtol=1e-6, atol=1e-9, method="rodas4",
                                    linsolve_dtype=jnp.float32, **kw)
    float(jnp.sum(out))
    dt = time.time() - t0
    nok = int(np.asarray(ok).sum())
    print(f"{tag:22s}: {nok / dt:7.1f} solves/s ({dt:6.2f} s, "
          f"{N - nok} failed)", flush=True)
    return out


out_nat = timed("native f64 RHS")
out_df = timed("df32 RHS")

# per-path global error vs tight f64 (member 0).  (The first run of
# this script extracted `sol.C[:, -1]` — the chunked layout's index —
# so its error check crashed on shapes; the throughput rows were
# unaffected, both paths timed the same extract.)  MEASURED RESULT
# (v5e 2026-08-21): native 853.4 vs df32 856.3 solves/s — a tie; with
# the 7% RHS-level LOSS in bench_df32_rhs.py this is dead end 4, see
# ops/batch_stiff.solve_stiff_batch's docstring.
ref = g.solve_stiff(system, Co64, Params.unpack(jnp.asarray(batch[0])),
                    dr=0.2, tf=5.0, Nts=2, rtol=1e-8, atol=1e-11)
Cref = np.asarray(ref.C[-1])
for tag, o in (("native", out_nat), ("df32", out_df)):
    e = float(np.max(np.abs(np.asarray(o[0], np.float64) - Cref)
                     / (np.abs(Cref) + 1e-8)))
    print(f"global err vs tight f64 ({tag}): {e:.2e}")
