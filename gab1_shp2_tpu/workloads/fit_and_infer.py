"""MAP fitting + NUTS posterior sampling driver (port of
``Julia/param_fitting+inference_finitediff.jl``).

Stage 1: multistart LBFGS MAP fit of (kG1p, kG1dp, kSa, kSi) against
the 26.426% SHP2-bound-GAB1 datum -> ``fitted_parameters.csv``.
Stage 2: NUTS chains (vmapped; the reference uses 5 chains x 1000
samples via MCMCDistributed) -> posterior samples + quantile CSVs in
the reference's layout.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from gab1_shp2_tpu.inference.loss import (
    FIT_NAMES,
    make_log_posterior,
    make_observable_fn,
)
from gab1_shp2_tpu.inference.map_fit import map_fit
from gab1_shp2_tpu.inference.nuts import NUTSState, sample, warmup
from gab1_shp2_tpu.utils.cache import Checkpointer
from gab1_shp2_tpu.workloads import common

QS = (0.025, 0.25, 0.5, 0.75, 0.975)


def main(argv=None):
    ap = common.default_argparser(__doc__)
    ap.add_argument("--stage", choices=("map", "nuts", "both"),
                    default="both")
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
    args = ap.parse_args(argv)
    out = args.outdir
    os.makedirs(out, exist_ok=True)

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

    if args.stage in ("nuts", "both"):
        obs = make_observable_fn(dr=args.dr, rtol=args.rtol)
        lp = make_log_posterior(obs)
        if x_map is None:
            x_map = jnp.log(jnp.asarray([0.42, 9.5, 0.42, 9.5]))
        keys = jax.random.split(jax.random.PRNGKey(args.seed), args.chains)

        # resumable sampling: warm up once, then draw in checkpointed
        # blocks (the reference has no mid-run checkpointing; long NUTS
        # runs here survive interruption)
        block = max(1, min(100, args.samples))
        cfg = {"dr": args.dr, "rtol": args.rtol, "chains": args.chains,
               "warmup": args.warmup, "samples": args.samples,
               "seed": args.seed}
        ck = Checkpointer("nuts", cfg, cache_dir=f"{out}/cache", every=60.0)
        saved = ck.restore()

        vwarm = jax.vmap(lambda k: warmup(
            lp, x_map, k, num_warmup=args.warmup,
            max_depth=args.max_depth, target_accept=0.65,
            init_step_size=args.init_step))
        vsample = jax.vmap(lambda s: sample(lp, s, num_samples=block,
                                            max_depth=args.max_depth))

        if saved is None:
            state = vwarm(keys)
            qs_blocks, div_blocks, done = [], [], 0
        else:
            state = NUTSState(*[jnp.asarray(saved[f"s{i}"])
                                for i in range(len(NUTSState._fields))])
            qs_blocks = [saved["qs"]]
            div_blocks = [saved["div"]]
            done = int(saved["done"])
            print(f"resumed NUTS at {done}/{args.samples} samples")

        while done < args.samples:
            state, qs, info = vsample(state)
            qs_blocks.append(np.asarray(qs))
            div_blocks.append(np.asarray(info["diverged"]))
            done += block
            ck.maybe_save({**{f"s{i}": np.asarray(l) for i, l in
                              enumerate(state)},
                           "qs": np.concatenate(qs_blocks, axis=1),
                           "div": np.concatenate(div_blocks, axis=1),
                           "done": done})
            print(f"  {done}/{args.samples} samples", flush=True)
        ck.clear()

        qs_all = np.concatenate(qs_blocks, axis=1)[:, : args.samples]
        div_all = np.concatenate(div_blocks, axis=1)[:, : args.samples]
        samples = np.exp(np.asarray(qs_all).reshape(-1, 4))
        div = int(div_all.sum())
        print(f"NUTS: {args.chains}x{args.samples} samples, "
              f"{div} divergences")
        common.save_csv(
            f"{out}/posterior_samples.csv", list(FIT_NAMES),
            samples.tolist())
        rows = []
        for j, n in enumerate(FIT_NAMES):
            q = np.quantile(samples[:, j], QS)
            rows.append([n] + list(q) + [samples[:, j].mean()])
            print(f"  {n}: median {q[2]:.4g} [{q[0]:.4g}, {q[4]:.4g}]")
        common.save_csv(f"{out}/posterior_quantiles.csv",
                        ["param"] + [f"q{q}" for q in QS] + ["mean"], rows)

        if args.predictive:
            _predictive_checks(obs, samples, args, out)


def _predictive_checks(obs, posterior_samples, args, out):
    """Prior and posterior predictive distributions of the observable
    (% SHP2-bound GAB1), mirroring the reference's predict() checks."""
    import jax

    from gab1_shp2_tpu.models.params import EXPTL_PCT_SHP2_BOUND_GAB1
    from gab1_shp2_tpu.priors.literature import build_priors

    m = args.predictive
    rng = np.random.default_rng(args.seed + 7)
    ln = build_priors().lognorm
    prior_draws = np.stack(
        [rng.lognormal(*ln[n]) for n in FIT_NAMES], axis=-1
    ) if m == 1 else np.stack(
        [rng.lognormal(ln[n][0], ln[n][1], size=m) for n in FIT_NAMES],
        axis=-1)
    post_idx = rng.choice(len(posterior_samples), size=m, replace=False)
    post_draws = posterior_samples[post_idx]

    vobs = jax.jit(jax.vmap(lambda x: obs(jnp.log(x))))
    rows = []
    for label, draws in (("prior", prior_draws), ("posterior", post_draws)):
        y = np.asarray(vobs(jnp.asarray(draws)))
        y = y[np.isfinite(y)]
        q = np.quantile(y, QS)
        rows.append([label] + list(q))
        print(f"{label} predictive %SHP2-bound GAB1: median {q[2]:.2f} "
              f"[{q[0]:.2f}, {q[4]:.2f}] (datum "
              f"{EXPTL_PCT_SHP2_BOUND_GAB1[0]})")
    common.save_csv(f"{out}/predictive_checks.csv",
                    ["which"] + [f"q{q}" for q in QS], rows)


if __name__ == "__main__":
    main()
