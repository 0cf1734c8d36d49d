"""Headline benchmark: stiff MoL ensemble solves/sec.

Workload (BASELINE.json north star): a parameter-ensemble stiff MoL
solve of the base spherical GAB1-SHP2 model at the reference's ensemble
configuration (dr=0.2, tf=5 min, reltol 1e-4;
``get_param_posteriors.jl:135-168``, ``define_PDESystem_base.jl:288``).

Production configuration: the batch-aware lane-minor integrator
(``ops/batch_stiff.py``) — float32 RODAS4 (order-4 L-stable
Rosenbrock) with block-cyclic-reduction linear algebra laid out with
the ensemble axis minor, so the (10, 10) stage blocks fill full TPU
vector tiles.  Dispatches are chunked at 256 members: the axon TPU
runtime kills single executions over ~60 s.  RODAS4 replaced
Rosenbrock23 as the default after measuring 1435 vs 1050 solves/s at
this config (2.7x fewer steps at ~2x the per-step solves) with 4x
better accuracy; scripts/bench_rodas4.py reproduces the comparison.

Also measured (reported in details): the **north-star configuration**
of BASELINE.json — float64 state at rtol 1e-6 with float32 linear
solves (exact for a W-method: the stage solves share one consistent
W-tilde), agreement validated against an rtol-1e-8 float64 reference
solve — and the **GSA/ensemble production recipe** (float64 RODAS4
with float32 linear algebra at rtol 1e-4; see
scripts/probe_gsa_mixed.py for the recipe's corner validation).

``vs_baseline`` is the ratio to a *measured* single-solve baseline:
``tests/reference_numpy_solver.py`` (the independent scalar
transcription of the reference's explicit scheme) at this exact
configuration, 49.2 s/solve on this host's CPU (2026-08-16; re-measure
with ``python bench.py --measure-baseline``).  The reference itself
publishes no wall-clock numbers (SURVEY.md section 6).

Prints ONE JSON line.
"""

import json
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

# measured: tests/reference_numpy_solver.py single solve, dr=0.2, tf=5,
# Nts=2, host CPU (single core), 2026-08-16.  Regenerate with
# --measure-baseline.
BASELINE_SOLVES_PER_SEC = 1.0 / 49.21

CHUNK = 256


def _final_C(sol):
    """Per-lane extract for the refill path: final-time bulk profiles
    (matches the chunked loop's ``sol.C[:, -1]`` rows)."""
    return sol.C[-1]


def _measure_baseline():
    import gab1_shp2_tpu as g
    from tests.reference_numpy_solver import solve_numpy

    Co = np.asarray(g.default_co())
    p = g.default_params()
    t0 = time.time()
    solve_numpy(Co, np.asarray(p.D), np.asarray(p.k), R=10.0, dr=0.2,
                tf=5.0, Nts=2)
    dt = time.time() - t0
    print(f"reference_numpy_solver: {dt:.2f} s/solve "
          f"({1.0 / dt:.5f} solves/s)")


def main():
    import gab1_shp2_tpu as g
    from gab1_shp2_tpu.models.params import Params
    from gab1_shp2_tpu.ops.batch_stiff import (solve_stiff_batch,
                                               solve_stiff_refill)

    system = g.base_system()
    Co64 = g.default_co()
    Co32 = Co64.astype(jnp.float32)

    # ensemble: perturbed baseline parameters (deterministic, no I/O)
    N = 1024
    rng = np.random.default_rng(0)
    p0 = np.asarray(g.default_params().pack())
    batch = p0[None, :] * np.exp(rng.normal(0.0, 0.10, size=(N, 24)))
    batch[:, 21] = p0[21]  # EGF held fixed, as in the reference ensembles

    def run_chunks(Co, pbatch, **kw):
        outs, fails, steps = [], [], 0
        for s in range(0, N, CHUNK):
            pb = Params.unpack(jnp.asarray(pbatch[s:s + CHUNK], Co.dtype))
            sol, stats = solve_stiff_batch(system, Co, pb, dr=0.2, tf=5.0,
                                           Nts=2, return_stats=True, **kw)
            outs.append(sol.C[:, -1])
            fails.append(stats.failed)
            # lanes advance in sync: a chunk's while_loop runs until its
            # slowest lane finishes, so loop trip count = per-lane max
            steps += int(np.asarray(stats.n_accepted
                                    + stats.n_rejected).max())
        return jnp.concatenate(outs), jnp.concatenate(fails), steps

    def run_refill(Co, pbatch, **kw):
        pb = Params.unpack(jnp.asarray(pbatch, Co.dtype))
        out, ok, steps = solve_stiff_refill(
            system, Co, pb, extract=_final_C, dr=0.2, tf=5.0, Nts=2,
            lanes=CHUNK, **kw)
        return out, ~ok, steps

    def sync(out):
        # fetch a device-side scalar reduction: forces completion of
        # everything it depends on while moving 4 bytes.  (np.asarray
        # of the full output adds an ~0.08 s tunnel fetch of ~2 MB
        # that is not solve time; bare block_until_ready was once
        # observed returning early on this backend — measured
        # chunked/refill scalar 3826/4019 vs mat 3017/2933 solves/s,
        # /tmp/probe_sync2 2026-08-19.)
        return float(jnp.sum(out))

    def timed(Co, scheduler="refill", **kw):
        run = run_refill if scheduler == "refill" else run_chunks
        out, failed, steps = run(Co, batch, **kw)  # warmup/compile
        sync(out)
        t0 = time.time()
        out, failed, steps = run(Co, batch, **kw)
        sync(out)
        dt = time.time() - t0
        if scheduler == "refill":
            # whole-queue program: charge the max per-member step count
            # as the loop depth proxy (refill has no chunk barriers)
            steps = int(np.asarray(steps).max())
        return out, int(np.asarray(failed).sum()), dt, steps

    # headline: f32 rodas4, rtol 1e-4, lane-refill scheduler (the
    # production default since round 4; scripts/bench_refill.py).
    # Median of 3: believed stable in r4 (~3940-4020), but measured
    # 3385-3794 across runs on 2026-08-21 (post-reboot tunnel), so the
    # single-dispatch row gets the same treatment as the chunked one.
    hl_runs = [timed(Co32, rtol=1e-4, atol=1e-7, method="rodas4")
               for _ in range(3)]
    out, n_failed, dt, _ = sorted(hl_runs, key=lambda r: r[2])[1]
    solves_per_sec = (N - n_failed) / dt

    # chunked-scheduler detail row (round-3-comparable metric; also
    # feeds the roofline's chunk-loop step counts).  Median of 3: the
    # multi-dispatch queue timing is noisy (2054-3826 solves/s across
    # r4 runs) while the single-dispatch refill row is stable —
    # median makes round-over-round comparison meaningful (VERDICT-r4).
    ch_runs = [timed(Co32, scheduler="sorted", rtol=1e-4, atol=1e-7,
                     method="rodas4") for _ in range(3)]
    out_ch, nf_ch, dt_ch, hl_steps = sorted(ch_runs,
                                            key=lambda r: r[2])[1]
    ch_solves_per_sec = (N - nf_ch) / dt_ch

    # north star: f64 rodas4 + f32 linear solves at rtol 1e-6
    out_ns, nf_ns, dt_ns, _ = timed(Co64, rtol=1e-6, atol=1e-9,
                                    method="rodas4",
                                    linsolve_dtype=jnp.float32)
    ns_solves_per_sec = (N - nf_ns) / dt_ns

    # GSA production recipe: f64 rodas4 + f32 linear algebra at the
    # ensemble tolerance (the round-3 default for all f64 sweeps)
    out_gsa, nf_gsa, dt_gsa, _ = timed(Co64, rtol=1e-4, atol=1e-7,
                                       method="rodas4",
                                       linsolve_dtype=jnp.float32)
    gsa_solves_per_sec = (N - nf_gsa) / dt_gsa

    # accuracy cross-check: one member, each path vs tight f64 solve
    p_one = Params.unpack(jnp.asarray(batch[0]))
    ref = g.solve_stiff(system, Co64, p_one, dr=0.2, tf=5.0, Nts=2,
                        rtol=1e-8, atol=1e-11)
    Cref = np.asarray(ref.C[-1])
    relerr = float(np.max(np.abs(np.asarray(out[0], np.float64) - Cref)
                          / (np.abs(Cref) + 1e-8)))
    relerr_ns = float(np.max(np.abs(np.asarray(out_ns[0], np.float64) - Cref)
                             / (np.abs(Cref) + 1e-8)))
    relerr_gsa = float(np.max(np.abs(np.asarray(out_gsa[0], np.float64)
                                     - Cref) / (np.abs(Cref) + 1e-8)))

    # --- analytic roofline for the headline config (VERDICT-r3 item 7):
    # an auditable HBM-traffic/FLOP model per integrator step, from the
    # step's structure alone (NB=Nr+1 block rows, B lanes, n=10 species,
    # f32).  Per RODAS4 step the block-tridiagonal band arrays (3 (n,n)
    # blocks per node row) dominate traffic:
    #   J build:  write 3 bands once ................ 1x band_bytes
    #   W factor (block cyclic reduction): read J +
    #     read/write reduced levels (NB*(1+1/2+...) ~
    #     2*NB block rows, each read+written) ........ 4x band_bytes
    #   6 stage solves: each reads the factors in a
    #     forward + a backward sweep ................. 12x band_bytes
    #   6 RHS evals + stage/controller vector ops .... ~20x state_bytes
    # FLOPs: factor ~ 2*NB rows x (2/3 n^3 LU + ~4 block multiply-adds
    # at 2n^3) per row; solves ~ 6 x 2 sweeps x 2*NB block matvecs at
    # 2n^2; RHS/vector terms are O(n*NB*B) and negligible.  This is a
    # lower-bound model (it ignores re-reads the compiler fails to keep
    # in VMEM), so pct_hbm_peak is a floor on achieved bandwidth.
    n_spec, NB = 10, int(round(10.0 / 0.2)) + 1
    band_bytes = 3 * NB * n_spec**2 * CHUNK * 4
    state_bytes = (n_spec * NB + 8) * CHUNK * 4
    bytes_per_step = 17 * band_bytes + 20 * state_bytes
    flops_per_step = (2 * NB * (2 / 3 + 8) * n_spec**3 * CHUNK
                      + 24 * NB * 2 * n_spec**2 * CHUNK)
    steps_per_sec = hl_steps / dt_ch
    achieved_gbps = bytes_per_step * steps_per_sec / 1e9
    HBM_PEAK_GBPS = 819.0  # TPU v5e HBM bandwidth

    result = {
        "metric": "stiff MoL ensemble solves/sec (dr=0.2, tf=5min, rtol=1e-4)",
        "value": round(solves_per_sec, 3),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / BASELINE_SOLVES_PER_SEC, 1),
        "details": {
            "N": N,
            "wall_s": round(dt, 3),
            "failed": n_failed,
            "method": "batch-aware lane-minor rodas4+cyclic-reduction,"
                      " float32, lane-refill scheduler",
            "chunked_scheduler": {
                "metric": "same config, cost-sorted 256-chunk dispatch "
                          "(round-3-comparable)",
                "solves_per_sec": round(ch_solves_per_sec, 3),
                "wall_s": round(dt_ch, 3),
                "failed": nf_ch,
            },
            "max_rel_err_vs_f64_rtol1e-8": relerr,
            "north_star": {
                "metric": "f64 rodas4 + f32 linsolve, rtol 1e-6",
                "solves_per_sec": round(ns_solves_per_sec, 3),
                "wall_s": round(dt_ns, 3),
                "failed": nf_ns,
                "max_rel_err_vs_f64_rtol1e-8": relerr_ns,
            },
            "gsa_config": {
                "metric": "f64 rodas4 + f32 linalg, rtol 1e-4 "
                          "(GSA/ensemble production recipe)",
                "solves_per_sec": round(gsa_solves_per_sec, 3),
                "wall_s": round(dt_gsa, 3),
                "failed": nf_gsa,
                "max_rel_err_vs_f64_rtol1e-8": relerr_gsa,
            },
            "roofline": {
                "config": "headline f32 rodas4 chunk (B=256, NB=51, "
                          "n=10)",
                "chunk_loop_steps": hl_steps,
                "steps_per_sec": round(steps_per_sec, 1),
                "bytes_per_step_model": bytes_per_step,
                "flops_per_step_model": int(flops_per_step),
                "achieved_GBps_model": round(achieved_gbps, 1),
                "hbm_peak_GBps": HBM_PEAK_GBPS,
                "pct_hbm_peak": round(100 * achieved_gbps
                                      / HBM_PEAK_GBPS, 1),
                "achieved_TFLOPs_model": round(
                    flops_per_step * steps_per_sec / 1e12, 3),
            },
            "baseline": "measured tests/reference_numpy_solver.py: "
                        "49.21 s/solve (host CPU, 2026-08-16)",
            "backend": jax.devices()[0].platform,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


def run_mesh(n_devices=None):
    """Multi-chip readiness bench (VERDICT-r4 item 7): the sharded
    lane-refill ensemble path (one independent refill queue per device
    via ``shard_map``, ``parallel/mesh.py`` semantics) at the headline
    config, reporting aggregate + per-device throughput and a
    per-device-consistency check against the single-queue result.

    On the one-chip dev setup run it on a virtual CPU mesh::

        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
            python bench.py --mesh --cpu 8

    When a v5e-N slice is attached, ``python bench.py --mesh`` produces
    the BASELINE.md multi-chip north-star number with zero new code.
    """
    import gab1_shp2_tpu as g
    from gab1_shp2_tpu.ensemble.engine import run_ensemble
    from jax.sharding import Mesh

    devs = jax.devices()
    D = int(n_devices) if n_devices else len(devs)
    if D > len(devs):
        # asking for more devices than the backend has would silently
        # bench a 1-device mesh labeled "N devices" — clamp loudly
        print(f"# --mesh {D} > {len(devs)} available devices; "
              f"using {len(devs)} (pass --cpu with "
              f"XLA_FLAGS=--xla_force_host_platform_device_count={D} "
              f"for a virtual mesh)", file=sys.stderr)
        D = len(devs)
    devs = devs[:D]
    mesh = Mesh(np.asarray(devs), ("ens",))
    system = g.base_system()
    Co32 = g.default_co().astype(jnp.float32)
    N = 256 * D
    rng = np.random.default_rng(0)
    p0 = np.asarray(g.default_params().pack())
    batch = p0[None, :] * np.exp(rng.normal(0.0, 0.10, size=(N, 24)))
    batch[:, 21] = p0[21]
    from gab1_shp2_tpu.models.params import Params
    pb = Params.unpack(jnp.asarray(batch, jnp.float32))

    kw = dict(solver="stiff", extract=_final_C, dr=0.2, tf=5.0, Nts=2,
              rtol=1e-4, atol=1e-7, method="rodas4", chunk=256,
              scheduler="refill")

    def run(device_axis=None, m=None):
        out, ok = run_ensemble(system, Co32, pb, device_axis=device_axis,
                               mesh=m, **kw)
        float(jnp.sum(jnp.nan_to_num(out)))  # device-side sync
        return out, ok

    out1, ok1 = run()                       # single-queue reference
    out, ok = run("ens", mesh)              # compile sharded program
    t0 = time.time()
    out, ok = run("ens", mesh)
    dt = time.time() - t0
    good = np.asarray(ok)
    consistent = bool(np.allclose(np.asarray(out)[good],
                                  np.asarray(out1)[np.asarray(ok1)],
                                  rtol=1e-5, atol=1e-8)
                      and (good == np.asarray(ok1)).all())
    sps = int(good.sum()) / dt
    print(json.dumps({
        "metric": f"sharded lane-refill ensemble solves/sec ({D} devices)",
        "value": round(sps, 3),
        "unit": "solves/s",
        "vs_baseline": round(sps / BASELINE_SOLVES_PER_SEC, 1),
        "details": {
            "N": N, "devices": D, "wall_s": round(dt, 3),
            "per_device_solves_per_sec": round(sps / D, 3),
            "failed": int((~good).sum()),
            "per_device_consistency_vs_single_queue": consistent,
            "backend": jax.devices()[0].platform,
        },
    }))


if __name__ == "__main__":
    if "--measure-baseline" in sys.argv:
        _measure_baseline()
    elif "--mesh" in sys.argv:
        if "--cpu" in sys.argv:
            # in-process pin (the axon plugin ignores JAX_PLATFORMS);
            # pair with XLA_FLAGS=--xla_force_host_platform_device_count=N
            jax.config.update("jax_platforms", "cpu")
        args = [a for a in sys.argv[sys.argv.index("--mesh") + 1:]
                if a.isdigit()]
        run_mesh(int(args[0]) if args else None)
    else:
        main()
