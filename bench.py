"""Headline benchmark: stiff MoL ensemble solves/sec.

Workload (BASELINE.json north star): a parameter-ensemble stiff MoL
solve of the base spherical GAB1-SHP2 model at the reference's ensemble
configuration (dr=0.2, tf=5 min, reltol 1e-4;
``get_param_posteriors.jl:135-168``, ``define_PDESystem_base.jl:288``),
batched with vmap on the available accelerator.

Production configuration: float32 Rosenbrock23 with block-cyclic-
reduction linear algebra (validated against the float64 TRBDF2 path to
<3e-4 relative at this tolerance — see tests/test_stiff.py and the
accuracy cross-check rerun here).  Dispatches are chunked at 256
members: the axon TPU runtime kills single executions over ~60 s.

The reference publishes no wall-clock numbers (SURVEY.md section 6), so
``vs_baseline`` is reported against a nominal 1.0 stiff solve/sec for
the reference's single-threaded Julia QNDF path — the ratio is then
"ensemble solves completed per Julia single-solve wall-clock", the
quantity the BASELINE.json target is phrased in.

Prints ONE JSON line.
"""

import json
import time

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

# nominal reference throughput: one single-threaded Julia QNDF solve per
# second (order-of-magnitude estimate for the 908-ODE dr=0.2 system; the
# reference records no timing — see BASELINE.md)
JULIA_SINGLE_SOLVE_PER_SEC = 1.0

CHUNK = 256


def main():
    import gab1_shp2_tpu as g
    from gab1_shp2_tpu.models.params import Params

    system = g.base_system()
    Co64 = g.default_co()
    Co32 = Co64.astype(jnp.float32)

    # ensemble: perturbed baseline parameters (deterministic, no I/O)
    N = 1024
    rng = np.random.default_rng(0)
    p0 = np.asarray(g.default_params().pack())
    batch = p0[None, :] * np.exp(rng.normal(0.0, 0.10, size=(N, 24)))
    batch[:, 21] = p0[21]  # EGF held fixed, as in the reference ensembles

    def one(p):
        sol, stats = g.solve_stiff(system, Co32, p, dr=0.2, tf=5.0, Nts=2,
                                   rtol=1e-4, atol=1e-7,
                                   method="rosenbrock23",
                                   return_stats=True)
        return sol.C[-1], stats.failed

    run = jax.jit(jax.vmap(one))
    pb32 = Params.unpack(jnp.asarray(batch, dtype=jnp.float32))

    def chunks(params):
        outs = []
        fails = []
        for s in range(0, N, CHUNK):
            sl = jax.tree_util.tree_map(lambda a: a[s:s + CHUNK], params)
            C, failed = run(sl)
            outs.append(C)
            fails.append(failed)
        return (jnp.concatenate(outs), jnp.concatenate(fails))

    # warmup/compile
    out, failed = chunks(pb32)
    out.block_until_ready()

    t0 = time.time()
    out, failed = chunks(pb32)
    out.block_until_ready()
    dt = time.time() - t0

    n_failed = int(np.asarray(failed).sum())
    solves_per_sec = (N - n_failed) / dt

    # accuracy cross-check: one member, fast path vs tight f64 TRBDF2
    p_one = Params.unpack(jnp.asarray(batch[0]))
    ref = g.solve_stiff(system, Co64, p_one, dr=0.2, tf=5.0, Nts=2,
                        rtol=1e-8, atol=1e-11)
    Cref = np.asarray(ref.C[-1])
    Cfast = np.asarray(out[0]).astype(np.float64)
    relerr = float(np.max(np.abs(Cfast - Cref) / (np.abs(Cref) + 1e-8)))

    result = {
        "metric": "stiff MoL ensemble solves/sec (dr=0.2, tf=5min, rtol=1e-4)",
        "value": round(solves_per_sec, 3),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / JULIA_SINGLE_SOLVE_PER_SEC, 3),
        "details": {
            "N": N,
            "wall_s": round(dt, 3),
            "failed": n_failed,
            "method": "rosenbrock23+cyclic-reduction, float32",
            "max_rel_err_vs_f64_rtol1e-8": relerr,
            "backend": jax.devices()[0].platform,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
