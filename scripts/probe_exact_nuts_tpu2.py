"""Probe 2: exact-likelihood NUTS leaf/draw cost on TPU — viable
precisions only.

Probe 1 ruled out full-f64 (leaf compile 28.5 min, 13 s/exec at B=5 —
emulated-f64 op-latency at tiny batch).  Here:
  * mixed: f64 state + f32 linear algebra (the GSA recipe)
  * f32: f32 state + f32 linalg (headline recipe; err 1.6e-5 at
    rtol 1e-4 — below the likelihood's solver tolerance, and a
    deterministic inexact gradient keeps NUTS exact: leapfrog stays
    reversible/volume-preserving, multinomial weights use the true
    logp)
For the winner, also time a one-draw warmup_block dispatch.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

sys.path.insert(0, "/root/repo")
from gab1_shp2_tpu.inference.loss import make_log_posterior, make_observable_fn
from gab1_shp2_tpu.inference.nuts import NUTSState, warmup_block

CKPT = ("/root/repo/results/inference/exact_nuts_r4/cache/"
        "ckpt_nuts_4f8bdd13fce953b1.npz")
z = np.load(CKPT, allow_pickle=True)
state64 = NUTSState(*[jnp.asarray(z[f"s{i}"]) for i in range(12)])
q64 = state64.q

configs = [
    ("mixed", jnp.float64, jnp.float32),
    ("f32", jnp.float32, jnp.float32),
]
results = {}
for tag, sdt, ls in configs:
    import gab1_shp2_tpu as g
    Co = g.default_co().astype(sdt)
    obs = make_observable_fn(Co=Co, method="rodas4", linsolve_dtype=ls)
    lp = make_log_posterior(obs)
    vg = jax.jit(jax.vmap(jax.value_and_grad(lp)))
    q = q64.astype(sdt)
    t0 = time.time()
    v, gr = vg(q)
    v.block_until_ready()
    print(f"[{tag}] leaf compile+run: {time.time()-t0:.1f} s; "
          f"lp {np.asarray(v)}", flush=True)
    walls = []
    for i in range(3):
        t0 = time.time()
        v, gr = vg(q * (1.0 + 1e-4 * (i + 1)))
        v.block_until_ready()
        walls.append(time.time() - t0)
    print(f"[{tag}] leaf warm: {['%.3f' % w for w in walls]} s", flush=True)
    results[tag] = min(walls)

best = min(results, key=results.get)
print("best:", best, results)
sdt = jnp.float64 if best == "mixed" else jnp.float32
import gab1_shp2_tpu as g
Co = g.default_co().astype(sdt)
obs = make_observable_fn(Co=Co, method="rodas4",
                         linsolve_dtype=jnp.float32)
lp = make_log_posterior(obs)
state = NUTSState(*[x.astype(sdt) if x.dtype == jnp.float64 else x
                    for x in state64])
vwarm = jax.jit(jax.vmap(
    lambda s, t0_: warmup_block(lp, s, t0_, num_block=1, num_warmup=200,
                                max_depth=6, target_accept=0.65),
    in_axes=(0, None)))
t0 = time.time()
s2 = vwarm(state, jnp.asarray(100, jnp.int32))
s2.q.block_until_ready()
print(f"[{best}] draw compile+run: {time.time()-t0:.1f} s", flush=True)
s = state
for i in range(6):
    t0 = time.time()
    s = vwarm(s, jnp.asarray(100 + i, jnp.int32))
    s.q.block_until_ready()
    print(f"[{best}] draw warm: {time.time()-t0:.2f} s; "
          f"eps {np.asarray(s.step_size)}", flush=True)
print("done")
