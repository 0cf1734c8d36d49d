"""MAP fitting + NUTS posterior sampling driver (port of
``Julia/param_fitting+inference_finitediff.jl``).

Stage 1: multistart LBFGS MAP fit of (kG1p, kG1dp, kSa, kSi) against
the 26.426% SHP2-bound-GAB1 datum -> ``fitted_parameters.csv``.
Stage 2: NUTS chains (the reference uses 5 chains x 1000 samples via
MCMCDistributed) -> posterior samples + quantile CSVs in the
reference's layout, for both the base cell (``--co base``) and the HeLa
abundances (``--co hela``; reference ``:380-444`` /
``Turing_res_5-chains_1000-spls_HeLa.jld2``).

Likelihood modes:

  * ``--likelihood surrogate`` (default, TPU-native): one chunked
    lane-minor ensemble sweep fills a Chebyshev surrogate of the
    observable (``inference/surrogate.py``); NUTS runs on the surrogate
    at ~1e5 FLOPs/leapfrog; every posterior draw is then re-evaluated
    with the exact PDE likelihood in one more batched dispatch and
    importance-reweighted.  Reported quantiles are exact up to the
    printed effective sample size.
  * ``--likelihood exact``: the reference's shape — one stiff PDE solve
    (+ forward-mode gradient) per leapfrog.  Hours per chain; kept for
    validation at small sample counts.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from gab1_shp2_tpu.inference.loss import (
    FIT_NAMES,
    datum_loglik,
    make_batch_observable,
    make_log_posterior,
    make_observable_fn,
    prior_box,
)
from gab1_shp2_tpu.inference.diagnostics import check_chains
from gab1_shp2_tpu.inference.map_fit import map_fit
from gab1_shp2_tpu.inference.nuts import (
    NUTSState,
    init as nuts_init,
    sample,
    warmup_block,
    warmup_finalize,
)
from gab1_shp2_tpu.inference.surrogate import (
    build_surrogate,
    importance_reweight,
    load_surrogate,
    save_surrogate,
    weighted_quantiles,
)
from gab1_shp2_tpu.utils.cache import Checkpointer
from gab1_shp2_tpu.workloads import common

QS = (0.025, 0.25, 0.5, 0.75, 0.975)


def _co_array(which: str):
    import gab1_shp2_tpu as g

    return g.default_co() if which == "base" else g.hela_co()


def main(argv=None):
    ap = common.default_argparser(__doc__)
    ap.add_argument("--stage", choices=("map", "nuts", "both", "predictive"),
                    default="both")
    ap.add_argument("--co", choices=("base", "hela"), default="base")
    ap.add_argument("--likelihood", choices=("surrogate", "exact"),
                    default="surrogate")
    ap.add_argument("--grid-n", type=int, default=17,
                    help="surrogate Chebyshev nodes per dimension")
    ap.add_argument("--chains", type=int, default=5)
    ap.add_argument("--samples", type=int, default=1000)
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--starts", type=int, default=101)
    ap.add_argument("--max-depth", type=int, default=8)
    ap.add_argument("--init-step", type=float, default=0.1)
    ap.add_argument("--predictive", type=int, default=0,
                    help="run prior/posterior predictive checks with "
                         "this many draws each "
                         "(param_fitting+inference_finitediff.jl:491-527)")
    ap.add_argument("--nuts-device", choices=("cpu", "tpu"), default="cpu",
                    help="where the NUTS chain loop runs.  cpu (default):"
                         " the surrogate lp is op-latency bound and a"
                         " 100-draw block is seconds on host.  tpu: for"
                         " the EXACT likelihood — one draw per dispatch"
                         " (watchdog-safe blocks), each leapfrog leaf a"
                         " batch-(chains) stiff solve + 4-tangent jacfwd"
                         " on the device")
    ap.add_argument("--lp-f32", action="store_true",
                    help="exact likelihood in float32 state + float32"
                         " linear algebra (the validated headline recipe:"
                         " solution error ~1.6e-5, far below the rtol"
                         " 1e-4 solver tolerance).  The gradient field"
                         " stays deterministic, so leapfrog remains"
                         " reversible/volume-preserving and NUTS remains"
                         " exact — only efficiency, not correctness,"
                         " depends on gradient accuracy.  ~10x leaf"
                         " throughput on TPU (emulated-f64 op latency"
                         " dominates otherwise)")
    args = ap.parse_args(argv)
    out = args.outdir
    os.makedirs(out, exist_ok=True)
    tag = "" if args.co == "base" else "_hela"
    Co = _co_array(args.co)

    if args.stage == "predictive":
        # standalone predictive checks from a committed posterior
        # (param_fitting+inference_finitediff.jl:491-527): load
        # posterior_samples{tag}.csv written by an earlier nuts run
        samples_csv = f"{out}/posterior_samples{tag}.csv"
        arr = np.loadtxt(samples_csv, delimiter=",", skiprows=1)
        samples, w = arr[:, :4], arr[:, 4]
        # importance-resample by the exact-likelihood weights so the
        # predictive subsampling below sees an unweighted posterior
        w = w / w.sum()
        ridx = np.random.default_rng(args.seed + 77).choice(
            len(samples), size=len(samples), replace=True, p=w)
        samples = samples[ridx]
        print(f"predictive checks from {samples_csv} "
              f"({len(samples)} weighted posterior draws, resampled)")
        obs = make_observable_fn(Co=Co, dr=args.dr, rtol=args.rtol)
        _predictive_checks(obs, samples, args, out, tag)
        return

    x_map = None
    if args.stage in ("map", "both"):
        res = map_fit(n_starts=args.starts, rtol=args.rtol,
                      dr_coarse=args.dr, dr_fine=args.dr / 2,
                      seed=args.seed + 123)
        print(f"MAP fit (loss {res.loss:.3e}):")
        for n in FIT_NAMES:
            print(f"  {n} = {res.values[n]:.6g}")
        common.save_csv(f"{out}/fitted_parameters.csv",
                        ["name", "value"],
                        [[n, res.values[n]] for n in FIT_NAMES])
        x_map = jnp.asarray(res.log_k4)

    if args.stage not in ("nuts", "both"):
        return

    if x_map is None:
        # separate --stage nuts invocation: reuse a MAP fit written by
        # an earlier --stage map run (reference inits all chains at the
        # MAP point, param_fitting+inference_finitediff.jl:404)
        fit_csv = f"{out}/fitted_parameters.csv"
        if os.path.exists(fit_csv):
            import csv

            with open(fit_csv) as f:
                vals = {r["name"]: float(r["value"])
                        for r in csv.DictReader(f)}
            x_map = jnp.log(jnp.asarray([vals[n] for n in FIT_NAMES]))
            print(f"chains init at MAP from {fit_csv}")
        else:
            x_map = jnp.log(jnp.asarray([0.42, 9.5, 0.42, 9.5]))

    if args.likelihood == "surrogate":
        qs_all, div_all, ok, sur = _run_nuts_surrogate(args, Co, x_map, out,
                                                       tag)
        if not ok:
            _fail_unhealthy(out, tag, qs_all)
        samples = _reweight_and_save(args, Co, qs_all, sur, out, tag)
    else:
        qs_all, div_all, ok = _run_nuts_exact(args, Co, x_map, out, tag)
        if not ok:
            _fail_unhealthy(out, tag, qs_all)
        samples = np.exp(np.asarray(qs_all).reshape(-1, 4))
        _save_posterior(out, tag, samples, None)

    if args.predictive:
        obs = make_observable_fn(Co=Co, dr=args.dr, rtol=args.rtol)
        _predictive_checks(obs, samples, args, out, tag)


def _fail_unhealthy(out, tag, qs_all):
    """Chain-health gate failed: quarantine the draws under a _FAILED
    suffix and exit nonzero, so downstream consumers (the reweighting
    stage, the chained HeLa watcher triggering off
    posterior_quantiles.csv) cannot silently use unhealthy chains
    (ADVICE r4)."""
    import sys

    samples = np.exp(np.asarray(qs_all).reshape(-1, 4))
    common.save_csv(f"{out}/posterior_samples{tag}_FAILED.csv",
                    list(FIT_NAMES), [list(s) for s in samples])
    print(f"unhealthy chains quarantined to "
          f"posterior_samples{tag}_FAILED.csv; see "
          f"nuts_diagnostics{tag}.csv", file=sys.stderr)
    sys.exit(1)


def _run_chains(lp, x_map, args, checkpoint_cfg, out, tag=""):
    """Warmup + block-sampled vmapped chains with checkpoint/resume.

    Default device is the host CPU: the surrogate sampling loop is
    op-latency bound (a few-KFLOP evaluation per leapfrog inside a
    while_loop), so on the TPU a 100-sample block is one multi-minute
    single execution — past the axon runtime's ~60 s watchdog — while
    on CPU it is seconds.  ``--nuts-device tpu`` keeps the chain loop
    on the accelerator with ONE-DRAW dispatches (each a <=2^max_depth
    leapfrog tree; a draw stays well under the watchdog) — the right
    shape for the exact PDE likelihood, whose leaf is a
    batch-(chains) stiff solve + 4-tangent jacfwd.
    """
    if getattr(args, "nuts_device", "cpu") == "tpu":
        return _run_chains_on(lp, x_map, args, checkpoint_cfg, out, tag)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:  # CPU-only test envs: already there
        cpu = jax.devices()[0]
    with jax.default_device(cpu):
        return _run_chains_on(lp, x_map, args, checkpoint_cfg, out, tag)


def _run_chains_on(lp, x_map, args, checkpoint_cfg, out, tag=""):
    keys = jax.random.split(jax.random.PRNGKey(args.seed), args.chains)
    on_tpu = getattr(args, "nuts_device", "cpu") == "tpu"
    # one draw per dispatch on TPU: the ~60 s runtime watchdog bounds a
    # single execution, and an exact-likelihood draw is seconds
    block = 1 if on_tpu else max(1, min(100, args.samples))
    # warmup is checkpointed in blocks too: on the exact likelihood a
    # 200-step adaptation phase is itself multi-hour, and losing it to
    # a machine recycle restarts the whole run (round-4 lesson)
    wblock = 1 if on_tpu else max(1, min(20, args.warmup))
    ck = Checkpointer("nuts", checkpoint_cfg, cache_dir=f"{out}/cache",
                      every=60.0)
    saved = ck.restore()

    if on_tpu:
        # host-driven trees: one dispatch per trajectory doubling, so
        # no single execution exceeds the ~60 s runtime watchdog even
        # at max-depth trees (nuts.make_host_tree_sampler); bitwise
        # identical draws to the compiled path (same rng stream)
        from gab1_shp2_tpu.inference.nuts import make_host_tree_sampler

        host_draw = make_host_tree_sampler(
            lp, max_depth=args.max_depth, num_warmup=args.warmup,
            target_accept=0.65)
    else:
        vwarm = jax.vmap(
            lambda s, t0, nb: warmup_block(
                lp, s, t0, num_block=nb, num_warmup=args.warmup,
                max_depth=args.max_depth, target_accept=0.65),
            in_axes=(0, None, None))
        vsample = jax.vmap(lambda s: sample(lp, s, num_samples=block,
                                            max_depth=args.max_depth))

    if saved is None:
        state = jax.vmap(lambda k: nuts_init(
            lp, x_map, k, step_size=args.init_step))(keys)
        qs_blocks, div_blocks, done, wdone = [], [], 0, 0
    else:
        state = NUTSState(*[jnp.asarray(saved[f"s{i}"])
                            for i in range(len(NUTSState._fields))])
        # pre-blocked-warmup checkpoints lack "wdone": they were only
        # ever written after warmup completed
        wdone = int(saved.get("wdone", args.warmup))
        qs_blocks = [saved["qs"]] if "qs" in saved else []
        div_blocks = [saved["div"]] if "div" in saved else []
        done = int(saved["done"]) if "done" in saved else 0
        print(f"resumed NUTS at warmup {wdone}/{args.warmup}, "
              f"{done}/{args.samples} samples")

    def save_ckpt():
        ck.maybe_save({**{f"s{i}": np.asarray(l) for i, l in
                          enumerate(state)},
                       "wdone": wdone, "done": done,
                       **({"qs": np.concatenate(qs_blocks, axis=1),
                           "div": np.concatenate(div_blocks, axis=1)}
                          if qs_blocks else {})})

    import time as _time

    t_last = _time.time()
    while wdone < args.warmup:
        if on_tpu:
            state, _ = host_draw(state, warm_t=wdone)
            wdone += 1
        else:
            nb = min(wblock, args.warmup - wdone)
            state = vwarm(state, wdone, nb)
            wdone += nb
        if wdone >= args.warmup:
            # idempotent: safe if the process dies and re-applies it
            state = warmup_finalize(state)
        save_ckpt()
        if not on_tpu or wdone % 10 == 0 or wdone >= args.warmup:
            print(f"  warmup {wdone}/{args.warmup} "
                  f"({_time.time() - t_last:.1f} s)", flush=True)
            t_last = _time.time()

    while done < args.samples:
        if on_tpu:
            state, info = host_draw(state)
            qs_blocks.append(np.asarray(state.q)[:, None, :])
            div_blocks.append(np.asarray(info.diverged)[:, None])
            done += 1
        else:
            state, qs, info = vsample(state)
            qs_blocks.append(np.asarray(qs))
            div_blocks.append(np.asarray(info["diverged"]))
            done += block
        save_ckpt()
        if not on_tpu or done % 10 == 0 or done >= args.samples:
            print(f"  {done}/{args.samples} samples "
                  f"({_time.time() - t_last:.1f} s)", flush=True)
            t_last = _time.time()
    ck.clear()

    qs_all = np.concatenate(qs_blocks, axis=1)[:, : args.samples]
    div_all = np.concatenate(div_blocks, axis=1)[:, : args.samples]
    print(f"NUTS: {args.chains}x{args.samples} samples, "
          f"{int(div_all.sum())} divergences")

    # sampler health gate (split R-hat / ESS / frozen-chain detection,
    # inference/diagnostics.py): the round-4 exact run shipped frozen
    # chains that only a human eyeballing divergence counts would have
    # caught — record the verdict next to the artifacts and refuse
    # silently-garbage output with a loud banner
    report = check_chains(qs_all, div_all, names=FIT_NAMES)
    common.save_csv(
        f"{out}/nuts_diagnostics{tag}.csv",
        ["param", "rhat", "ess"],
        [[n, report["rhat"][n], report["ess"][n]] for n in FIT_NAMES]
        + [["_divergence_rate", report["divergence_rate"], ""],
           ["_ok", int(report["ok"]), ""]])
    if not report["ok"]:
        print("!" * 64)
        print("NUTS HEALTH CHECK FAILED — do not use these samples:")
        for f in report["failures"]:
            print(f"  - {f}")
        print("!" * 64)
    else:
        worst = max(report["rhat"].values())
        print(f"NUTS health: ok (worst rhat {worst:.3f}, "
              f"min ess {min(report['ess'].values()):.0f})")
    return qs_all, div_all, bool(report["ok"])


def _run_nuts_surrogate(args, Co, x_map, out, tag):
    sur_path = f"{out}/surrogate{tag}_n{args.grid_n}.npz"
    if os.path.exists(sur_path):
        sur = load_surrogate(sur_path)
        print(f"loaded surrogate {sur_path}")
    else:
        lo, hi = prior_box()
        batch_obs = make_batch_observable(
            Co=Co, dr=args.dr, rtol=args.rtol, method="rodas4",
            linsolve_dtype=jnp.float32, max_steps=4000, chunk=args.chunk)
        print(f"building surrogate: {args.grid_n}^4 = "
              f"{args.grid_n**4} grid solves ...", flush=True)
        sur, grid_vals = build_surrogate(
            batch_obs, lo, hi, n=args.grid_n, chunk=args.chunk,
            progress=lambda i, n: print(f"  grid {i}/{n}", flush=True)
            if i % (args.chunk * 32) == 0 or i == n else None)
        save_surrogate(sur_path, sur, grid_vals)
        print(f"saved surrogate {sur_path}")

    lp = make_log_posterior(sur.y, wrap_vjp=False)
    cfg = {"surrogate": args.grid_n, "co": tag, "chains": args.chains,
           "warmup": args.warmup, "samples": args.samples,
           "seed": args.seed}
    qs_all, div_all, ok = _run_chains(lp, x_map, args, cfg, out, tag)
    return qs_all, div_all, ok, sur


def _run_nuts_exact(args, Co, x_map, out, tag):
    # rodas4 solves the same objective in ~2-3x fewer steps than the
    # trbdf2 default (AD-validated; see make_observable_fn) — on the
    # single-core CPU pin this is the difference between a reference-
    # scale 5x1000 validation run fitting in one round and not
    cfg = {"dr": args.dr, "rtol": args.rtol, "co": tag, "method": "rodas4",
           "chains": args.chains, "warmup": args.warmup,
           "samples": args.samples, "seed": args.seed}
    if args.lp_f32:
        # f32 state + f32 linear algebra (see the --lp-f32 help text
        # for the exactness argument); a distinct checkpoint config
        Co = jnp.asarray(Co, jnp.float32)
        x_map = jnp.asarray(x_map, jnp.float32)
        cfg["lp_dtype"] = "f32"
        obs = make_observable_fn(Co=Co, dr=args.dr, rtol=args.rtol,
                                 method="rodas4",
                                 linsolve_dtype=jnp.float32)
    else:
        obs = make_observable_fn(Co=Co, dr=args.dr, rtol=args.rtol,
                                 method="rodas4")
    lp = make_log_posterior(obs)
    return _run_chains(lp, x_map, args, cfg, out, tag)


def _reweight_and_save(args, Co, qs_all, sur, out, tag):
    """Exact PDE likelihood at every draw -> importance weights + ESS."""
    Q = np.asarray(qs_all).reshape(-1, 4)
    print(f"exact reweighting pass: {len(Q)} PDE solves ...", flush=True)
    batch_obs = make_batch_observable(
        Co=Co, dr=args.dr, rtol=1e-6, atol=1e-9, method="rodas4",
        linsolve_dtype=jnp.float32, max_steps=40_000, chunk=args.chunk)
    y_exact = batch_obs(Q)
    y_sur = np.asarray(jax.vmap(sur.y)(jnp.asarray(Q)))
    ll_exact = np.asarray(datum_loglik(jnp.asarray(y_exact)))
    ll_sur = np.asarray(datum_loglik(jnp.asarray(y_sur)))
    w, ess = importance_reweight(ll_exact, ll_sur)

    ok = np.isfinite(y_exact)
    dlog = np.abs(np.log(np.maximum(y_exact[ok], 1e-12))
                  - np.log(np.maximum(y_sur[ok], 1e-12)))
    print(f"surrogate fidelity at draws: max|dlog y| = {dlog.max():.3g}, "
          f"p95 = {np.percentile(dlog, 95):.3g}; "
          f"exact-solve failures: {int((~ok).sum())}")
    print(f"importance ESS = {ess:.0f} / {len(Q)}")

    samples = np.exp(Q)
    _save_posterior(out, tag, samples, w, ess=ess)
    # importance-resample before returning: downstream consumers (the
    # inline --predictive subsampling) treat the return value as an
    # unweighted posterior, so hand them one — matching what the
    # standalone --stage predictive does from the committed CSV
    ridx = np.random.default_rng(args.seed + 77).choice(
        len(samples), size=len(samples), replace=True, p=w / w.sum())
    return samples[ridx]


def _save_posterior(out, tag, samples, w, ess=None):
    rows = [[*samples[i], (w[i] if w is not None else 1.0)]
            for i in range(len(samples))]
    common.save_csv(f"{out}/posterior_samples{tag}.csv",
                    list(FIT_NAMES) + ["weight"], rows)
    qrows = []
    for j, n in enumerate(FIT_NAMES):
        if w is None:
            q = np.quantile(samples[:, j], QS)
            mean = samples[:, j].mean()
        else:
            q = weighted_quantiles(samples[:, j], w, QS)
            mean = float(np.sum(w * samples[:, j]))
        qrows.append([n] + list(q) + [mean])
        print(f"  {n}: median {q[2]:.4g} [{q[0]:.4g}, {q[4]:.4g}]")
    hdr = ["param"] + [f"q{q}" for q in QS] + ["mean"]
    common.save_csv(f"{out}/posterior_quantiles{tag}.csv", hdr, qrows)
    if ess is not None:
        common.save_csv(f"{out}/posterior_ess{tag}.csv",
                        ["n_draws", "ess"], [[len(samples), ess]])


def _predictive_checks(obs, posterior_samples, args, out, tag=""):
    """Prior and posterior predictive distributions of the observable
    (% SHP2-bound GAB1), mirroring the reference's predict() checks."""
    import jax

    from gab1_shp2_tpu.models.params import EXPTL_PCT_SHP2_BOUND_GAB1
    from gab1_shp2_tpu.priors.literature import build_priors

    # --predictive 0 (the default) means "reference draw count" when the
    # predictive stage itself was requested (predict() uses 500;
    # param_fitting+inference_finitediff.jl:491-527)
    m = args.predictive or 500
    rng = np.random.default_rng(args.seed + 7)
    ln = build_priors().lognorm
    prior_draws = np.stack(
        [rng.lognormal(*ln[n]) for n in FIT_NAMES], axis=-1
    ) if m == 1 else np.stack(
        [rng.lognormal(ln[n][0], ln[n][1], size=m) for n in FIT_NAMES],
        axis=-1)
    post_idx = rng.choice(len(posterior_samples), size=m,
                          replace=m > len(posterior_samples))
    post_draws = posterior_samples[post_idx]

    vobs = jax.jit(jax.vmap(lambda x: obs(jnp.log(x))))
    chunk = min(args.chunk, 128)  # TPU watchdog: keep dispatches < 60 s

    def vobs_chunked(draws):
        return np.concatenate(
            [np.asarray(vobs(jnp.asarray(draws[s:s + chunk])))
             for s in range(0, len(draws), chunk)])

    rows = []
    for label, draws in (("prior", prior_draws), ("posterior", post_draws)):
        y = vobs_chunked(draws)
        y = y[np.isfinite(y)]
        q = np.quantile(y, QS)
        rows.append([label] + list(q))
        print(f"{label} predictive %SHP2-bound GAB1: median {q[2]:.2f} "
              f"[{q[0]:.2f}, {q[4]:.2f}] (datum "
              f"{EXPTL_PCT_SHP2_BOUND_GAB1[0]})")
    common.save_csv(f"{out}/predictive_checks{tag}.csv",
                    ["which"] + [f"q{q}" for q in QS], rows)


if __name__ == "__main__":
    main()
