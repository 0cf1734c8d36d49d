"""Probe: can the exact-likelihood NUTS run live on the TPU?

The round-4 CPU-pinned 5x1000 exact run paces at ~1.6 min/draw
(~30 h+ total) on the single host core.  Each leapfrog leaf is a
batch-5 (vmapped chains) stiff solve + 4-tangent jacfwd — tiny-batch
work that should be latency-bound on the TPU.  The watchdog kills
single executions > ~60 s, so the viable shape is ONE DRAW PER
DISPATCH (warmup_block/sample with block size 1).

Measures, using the real round-4 checkpoint state (partly adapted,
step sizes O(1)):
  1. one vmapped value_and_grad leaf (f64, and f64+f32 linsolve)
  2. a few one-draw warmup_block dispatches (the real per-draw wall)
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
state = NUTSState(*[jnp.asarray(z[f"s{i}"]) for i in range(12)])
print("checkpoint: wdone", z["wdone"], "step sizes", np.asarray(state.step_size))

for ls in (None, jnp.float32):
    tag = "f64" if ls is None else "f64+f32ls"
    obs = make_observable_fn(method="rodas4", linsolve_dtype=ls)
    lp = make_log_posterior(obs)

    vg = jax.jit(jax.vmap(jax.value_and_grad(lp)))
    q = state.q
    t0 = time.time()
    v, g = vg(q)
    v.block_until_ready()
    print(f"[{tag}] leaf compile+run: {time.time()-t0:.1f} s; lp {np.asarray(v)}")
    for _ in range(3):
        t0 = time.time()
        v, g = vg(q + 0.001 * np.random.default_rng(0).normal(size=q.shape))
        v.block_until_ready()
        print(f"[{tag}] leaf warm: {time.time()-t0:.3f} s")

    vwarm = jax.jit(jax.vmap(
        lambda s, t0_: warmup_block(lp, s, t0_, num_block=1, num_warmup=200,
                                    max_depth=6, target_accept=0.65),
        in_axes=(0, None)))
    t0 = time.time()
    s2 = vwarm(state, jnp.asarray(60, jnp.int32))
    s2.q.block_until_ready()
    print(f"[{tag}] draw compile+run: {time.time()-t0:.1f} s")
    s = state
    for i in range(4):
        t0 = time.time()
        s = vwarm(s, jnp.asarray(60 + i, jnp.int32))
        s.q.block_until_ready()
        print(f"[{tag}] draw warm: {time.time()-t0:.2f} s; "
              f"eps {np.asarray(s.step_size)}")
print("done")
