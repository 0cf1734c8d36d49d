"""Measure the Nts>=50 refill exclusion + two-leg refill (VERDICT-r4
items 3 & 4).

The engine's auto-pick sends dense-output (Nts >= 50) ensembles to the
cost-sorted chunked scheduler on a heuristic ("the watchdog caps the
queue at chunk size anyway"), and until round 5 two-leg pulse-chase
had no refill path at all.  This measures both on real workload
shapes:

  A. dense output, single leg: N, Nts=100, f32 rodas4 rtol 1e-4
     (the run_base_model retrodiction-surface shape)
  B. two-leg pulse-chase, dense output: N, Nts=120, t_prechase=5,
     tf=7 (the gefitinib_pulse_chase.jl production shape)

each under: sorted chunked (chunk=128, the TPU dense cap) and refill
at a ladder of (lanes, group) settings, watchdog-safely (each refill
dispatch bounded by group; walls printed per dispatch so an operator
can see headroom against the ~60 s limit).

Run: python -u scripts/bench_refill_dense.py [N]
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
from gab1_shp2_tpu.ensemble.engine import run_ensemble
from gab1_shp2_tpu.models.params import Params

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

system = g.base_system()
Co32 = g.default_co().astype(jnp.float32)
rng = np.random.default_rng(0)
p0 = np.asarray(g.default_params().pack())
batch = p0[None, :] * np.exp(rng.normal(0.0, 0.10, size=(N, 24)))
batch[:, 21] = p0[21]
pb = Params.unpack(jnp.asarray(batch, jnp.float32))


def _final_profile(sol):
    return sol.C[:, ::20]  # a dense-ish reduction (6 of 101 slots)


def timed(label, **kw):
    out, ok = run_ensemble(system, Co32, pb, solver="stiff",
                           extract=_final_profile, rtol=1e-4, atol=1e-7,
                           method="rodas4", **kw)
    float(jnp.sum(jnp.nan_to_num(out)))
    t0 = time.time()
    out, ok = run_ensemble(system, Co32, pb, solver="stiff",
                           extract=_final_profile, rtol=1e-4, atol=1e-7,
                           method="rodas4", **kw)
    float(jnp.sum(jnp.nan_to_num(out)))
    dt = time.time() - t0
    nok = int(np.asarray(ok).sum())
    print(f"{label:44s}: {nok / dt:8.1f} solves/s  "
          f"({dt:6.2f} s, {N - nok} failed)", flush=True)
    return out, ok


for tag, legkw in (("dense Nts=100", dict(dr=0.2, tf=5.0, Nts=100)),
                   ("pulse-chase Nts=120",
                    dict(dr=0.2, tf=7.0, Nts=120, t_prechase=5.0))):
    print(f"--- {tag} (N={N}) ---", flush=True)
    base_out, base_ok = timed(f"{tag} sorted chunk=128",
                              chunk=128, scheduler="sorted", **legkw)
    for lanes, group in ((128, 256), (256, 256)):
        out, ok = timed(f"{tag} refill lanes={lanes} group={group}",
                        chunk=lanes, scheduler="refill",
                        refill_group=group, **legkw)
        same = np.allclose(np.asarray(out)[np.asarray(ok)],
                           np.asarray(base_out)[np.asarray(base_ok)],
                           rtol=1e-5, atol=1e-7)
        if not same:
            print("  !! output mismatch vs sorted", flush=True)
print("done")
