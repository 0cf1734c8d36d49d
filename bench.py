"""Headline benchmark: stiff MoL ensemble solves/sec.

Workload (BASELINE.json north star): a parameter-ensemble stiff MoL
solve of the base spherical GAB1-SHP2 model at the reference's ensemble
configuration (dr=0.2, tf=5 min, reltol 1e-4;
``get_param_posteriors.jl:135-168``, ``define_PDESystem_base.jl:288``),
batched with vmap on the available accelerator.

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
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

# nominal reference throughput: one single-threaded Julia QNDF solve per
# second (order-of-magnitude estimate for the 908-ODE dr=0.2 system; the
# reference records no timing — see BASELINE.md)
JULIA_SINGLE_SOLVE_PER_SEC = 1.0


def main():
    import gab1_shp2_tpu as g
    from gab1_shp2_tpu.models.params import Params

    system = g.base_system()
    Co = g.default_co()

    # ensemble: perturbed baseline parameters (deterministic, no I/O)
    N = 512
    rng = np.random.default_rng(0)
    p0 = np.asarray(g.default_params().pack())
    batch = p0[None, :] * np.exp(rng.normal(0.0, 0.10, size=(N, 24)))
    batch[:, 21] = p0[21]  # EGF held fixed, as in the reference ensembles
    pb = Params.unpack(jnp.asarray(batch))

    def one(p):
        sol, stats = g.solve_stiff(system, Co, p, dr=0.2, tf=5.0, Nts=20,
                                   rtol=1e-4, atol=1e-7, return_stats=True)
        return sol.C[-1], stats.failed

    run = jax.jit(jax.vmap(one))
    # warmup/compile
    out, failed = run(jax.tree_util.tree_map(lambda a: a[: N // 8], pb))
    out.block_until_ready()

    t0 = time.time()
    out, failed = run(pb)
    out.block_until_ready()
    dt = time.time() - t0

    n_failed = int(np.asarray(failed).sum())
    solves_per_sec = (N - n_failed) / dt
    result = {
        "metric": "stiff MoL ensemble solves/sec (dr=0.2, tf=5min, rtol=1e-4, f64)",
        "value": round(solves_per_sec, 3),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / JULIA_SINGLE_SOLVE_PER_SEC, 3),
        "details": {
            "N": N,
            "wall_s": round(dt, 3),
            "failed": n_failed,
            "backend": jax.devices()[0].platform,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
