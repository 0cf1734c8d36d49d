"""Micro-bench: emulated-f64 RHS vs compensated double-f32 RHS (TPU).

VERDICT-r4 item 6: the f64 north-star configs are RHS-bound (58% of
step wall in the 6 emulated-f64 RHS evals,
scripts/profile_step_components.py).  This measures, at the production
lane shape (B=256, dr=0.2 -> NB=51):

  * f64 RHS (emulated)          — the current north-star path
  * df32 RHS (ops/rhs_df32.py)  — EFT double-f32, ~2^-48 accurate
  * f32 RHS                     — the floor (native f32)

plus the same comparison for the 38-color Jacobian-band JVPs (which
the north star already runs in f32 — listed for context).

Run on the TPU: python -u scripts/bench_df32_rhs.py [ITERS]
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
from gab1_shp2_tpu.ops.batch_stiff import _lanes_y0, make_mol_rhs_lanes
from gab1_shp2_tpu.ops.rhs_df32 import make_mol_rhs_lanes_df32

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
B, R, dr = 256, 10.0, 0.2
M = int(round(R / dr)) - 1

system = g.base_system()
rng = np.random.default_rng(0)
Co = np.asarray(g.default_co())
CoT = jnp.asarray(np.repeat(Co[:, None], B, 1) * rng.lognormal(0, 0.2, (5, B)))
p0 = np.asarray(g.default_params().pack())
pb64 = Params.unpack(jnp.asarray(p0[None, :] * rng.lognormal(0, 0.2, (B, 24))))
y64 = _lanes_y0(CoT, M, jnp.float64)
y64 = y64 + 0.01 * jnp.asarray(rng.lognormal(0, 0.5, y64.shape)) * (y64 + 1e-3)

f64_rhs, _ = make_mol_rhs_lanes(system, R, dr)
df32_rhs, _ = make_mol_rhs_lanes_df32(system, R, dr)

pb32 = Params(D=pb64.D.astype(jnp.float32), k=pb64.k.astype(jnp.float32))
y32 = y64.astype(jnp.float32)


def bench(tag, fn, y, p):
    @jax.jit
    def loop(y):
        def body(i, acc):
            return acc + fn(y + 1e-12 * i, p)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros_like(y)).sum()

    v = loop(y)
    float(v)  # compile+run
    t0 = time.time()
    v = loop(y)
    float(v)
    dt = time.time() - t0
    print(f"{tag:10s}: {dt / ITERS * 1e6:8.1f} us/eval "
          f"({ITERS} iters, {dt:.2f} s)", flush=True)
    return dt / ITERS


t64 = bench("f64", f64_rhs, y64, pb64)
tdf = bench("df32", df32_rhs, y64, pb64)
t32 = bench("f32", f64_rhs, y32, pb32)

a = np.asarray(f64_rhs(y64, pb64))
b = np.asarray(df32_rhs(y64, pb64))
rel = np.max(np.abs(a - b) / (np.abs(a) + 1e-30 * np.abs(a).max()))
print(f"df32 vs f64 max rel err: {rel:.2e}")
print(f"ratios: df32/f64 = {tdf / t64:.2f}, f64/f32 = {t64 / t32:.2f}")
