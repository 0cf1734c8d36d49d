"""Inference stack tests: NUTS on analytic targets, gradients through
the stiff solver, MAP fitting, and the Bayesian model."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gab1_shp2_tpu.inference.loss import (
    DATUM_SIGMA,
    FIT_NAMES,
    chi2_loss,
    make_log_posterior,
    make_observable_fn,
    set_fitted,
)
from gab1_shp2_tpu.inference.nuts import run_nuts
from gab1_shp2_tpu.models.params import default_params


class TestNUTS:
    def test_standard_normal(self):
        logp = lambda q: -0.5 * jnp.sum(q**2)
        qs, info = run_nuts(logp, jnp.zeros(3), jax.random.PRNGKey(0),
                            num_warmup=400, num_samples=1500)
        qs = np.asarray(qs)
        np.testing.assert_allclose(qs.mean(0), 0.0, atol=0.12)
        np.testing.assert_allclose(qs.std(0), 1.0, atol=0.12)
        assert int(np.asarray(info["diverged"]).sum()) == 0
        # adapted acceptance near target
        assert 0.5 < float(np.mean(np.asarray(info["accept_stat"]))) < 0.95

    def test_correlated_gaussian(self):
        cov = jnp.array([[2.0, 1.5], [1.5, 2.0]])
        prec = jnp.linalg.inv(cov)
        logp = lambda q: -0.5 * q @ prec @ q
        qs, _ = run_nuts(logp, jnp.zeros(2), jax.random.PRNGKey(1),
                         num_warmup=500, num_samples=4000)
        est = np.cov(np.asarray(qs).T)
        np.testing.assert_allclose(est, np.asarray(cov), atol=0.35)

    def test_nonzero_mean_and_scales(self):
        mu = jnp.array([3.0, -2.0])
        sig = jnp.array([0.5, 4.0])
        logp = lambda q: -0.5 * jnp.sum(((q - mu) / sig) ** 2)
        qs, _ = run_nuts(logp, jnp.zeros(2), jax.random.PRNGKey(2),
                         num_warmup=600, num_samples=3000)
        qs = np.asarray(qs)
        np.testing.assert_allclose(qs.mean(0), np.asarray(mu), atol=0.3)
        np.testing.assert_allclose(qs.std(0), np.asarray(sig), rtol=0.15)

    def test_nan_region_cannot_poison_adaptation(self):
        """A logdensity that returns NaN outside a wall (the exact PDE
        likelihood does this when a solve fails or its forward tangents
        overflow) must act like a divergence wall, not poison warmup.

        Regression for the round-4 5x1000 exact-likelihood run: one NaN
        accept-statistic during warmup made dual averaging's h_bar —
        and hence the finalized step size — NaN, freezing every chain
        with 100% post-warmup divergences.  With the leaf-level
        non-finite-delta guard in ``_nuts_step`` the same target warms
        up to a finite step size and samples the interior correctly."""
        from gab1_shp2_tpu.inference.nuts import (
            init, sample, warmup_block, warmup_finalize)

        def logp(q):
            v = -0.5 * jnp.sum(q**2)
            return jnp.where(jnp.any(jnp.abs(q) > 4.0), jnp.nan, v)

        keys = jax.random.split(jax.random.PRNGKey(0), 3)
        st = jax.vmap(lambda k: init(logp, jnp.zeros(4), k,
                                     step_size=0.1))(keys)
        for t0 in range(0, 200, 20):  # blocked, as the workload runs it
            st = jax.vmap(
                lambda s, t: warmup_block(logp, s, t, num_block=20,
                                          num_warmup=200, max_depth=6),
                in_axes=(0, None))(st, t0)
        st = warmup_finalize(st)
        assert np.all(np.isfinite(np.asarray(st.step_size)))

        _, qs, info = jax.vmap(
            lambda s: sample(logp, s, num_samples=200, max_depth=6))(st)
        qs = np.asarray(qs)
        div = np.asarray(info["diverged"])
        assert div.mean() < 0.2, f"divergence rate {div.mean():.2f}"
        for c in range(qs.shape[0]):  # chains move (were frozen solid)
            assert len(np.unique(qs[c, :, 0])) > 100
        np.testing.assert_allclose(qs[..., 0].mean(), 0.0, atol=0.15)
        np.testing.assert_allclose(qs[..., 0].std(), 1.0, atol=0.15)

    def test_blocked_warmup_matches_one_shot(self):
        """Resumable blocked warmup (``warmup_block`` pieces, the
        checkpointed path in ``fit_and_infer._run_chains_on``) must
        reproduce the one-shot ``warmup`` exactly: same adaptation
        trajectory, same midpoint mass adoption, same final
        dual-averaged step size — blocking only changes where the
        carried ``NUTSState`` is materialized."""
        from gab1_shp2_tpu.inference.nuts import (
            init, warmup, warmup_block, warmup_finalize)

        logp = lambda q: -0.5 * jnp.sum(q**2)
        key = jax.random.PRNGKey(7)
        one = warmup(logp, jnp.zeros(3), key, num_warmup=50, max_depth=6)

        state = init(logp, jnp.zeros(3), key, step_size=0.1)
        for t0, nb in ((0, 20), (20, 20), (40, 10)):  # uneven blocks
            state = warmup_block(logp, state, t0, num_block=nb,
                                 num_warmup=50, max_depth=6)
        blocked = warmup_finalize(state)
        # finalize is idempotent (resume may re-apply it)
        blocked = warmup_finalize(blocked)

        for a, b, name in zip(one, blocked, one._fields):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=name)

    def test_tree_depth_symmetric(self):
        """Regression test for the direction-aware within-subtree U-turn
        check: with the sign-inverted check, backward-built subtrees
        terminate almost immediately (mean depth ~2.9 on a 1D standard
        Gaussian at eps=0.05 instead of the ~5-6 a correct sampler
        needs before the trajectory U-turns)."""
        from gab1_shp2_tpu.inference.nuts import _nuts_step, init

        logp = lambda q: -0.5 * jnp.sum(q**2)
        state = init(logp, jnp.zeros(1), jax.random.PRNGKey(7),
                     step_size=0.05)

        def step(state, _):
            state, info = _nuts_step(logp, state, max_depth=10)
            return state, info.depth

        _, depths = jax.lax.scan(step, state, None, length=300)
        mean_depth = float(np.asarray(depths).mean())
        assert mean_depth > 4.5, mean_depth

    def test_vmapped_chains(self):
        logp = lambda q: -0.5 * jnp.sum(q**2)
        keys = jax.random.split(jax.random.PRNGKey(3), 4)
        qs = jax.vmap(lambda k: run_nuts(logp, jnp.zeros(2), k,
                                         num_warmup=200,
                                         num_samples=400)[0])(keys)
        assert qs.shape == (4, 400, 2)
        pooled = np.asarray(qs).reshape(-1, 2)
        np.testing.assert_allclose(pooled.std(0), 1.0, atol=0.15)


FAST = dict(dr=0.5, tf=1.0, rtol=1e-3, atol=1e-6)


class TestPDELikelihood:
    def test_observable_and_grad(self):
        obs = make_observable_fn(**FAST)
        x0 = jnp.log(jnp.asarray([0.42, 9.5, 0.42, 9.5]))
        y = float(obs(x0))
        assert 0.0 < y < 100.0
        g = np.asarray(jax.jacfwd(obs)(x0))
        assert np.isfinite(g).all()
        # increasing SFK activation increases SHP2-bound GAB1
        assert g[2] > 0
        # increasing GAB1 dephosphorylation decreases it
        assert g[1] < 0

    def test_chi2_loss_nan_guard(self):
        obs = lambda x: jnp.nan * x[0]
        assert float(chi2_loss(obs, jnp.zeros(4))) == np.inf

    def test_log_posterior_finite_and_peaked(self):
        obs = make_observable_fn(**FAST)
        lp = make_log_posterior(obs)
        x_modes = jnp.log(jnp.asarray([0.42, 9.5, 0.42, 9.5]))
        v0 = float(lp(x_modes))
        assert np.isfinite(v0)
        # far outside the truncation the barrier dominates
        v_far = float(lp(x_modes + 20.0))
        assert v_far < v0 - 1e4

    def test_set_fitted(self):
        p = default_params(fit="prior")
        p2 = set_fitted(p, jnp.log(jnp.asarray([1.0, 2.0, 3.0, 4.0])))
        assert float(p2.kG1p) == pytest.approx(1.0)
        assert float(p2.kSi) == pytest.approx(4.0)
        # untouched parameters stay
        assert float(p2.kS2r) == float(p.kS2r)


class TestMAPFit:
    def test_small_multistart_improves(self):
        """A scaled-down multistart fit must drive the chi^2 loss to
        ~zero (single datum, one effective degree of freedom)."""
        from gab1_shp2_tpu.inference.map_fit import map_fit

        res = map_fit(n_starts=16, n_local=2, max_iters=10,
                      dr_coarse=0.5, dr_fine=0.4, rtol=1e-3, seed=1)
        assert np.isfinite(res.loss)
        assert res.loss < np.nanmin(res.start_losses) + 1e-12
        assert res.loss < 0.05
        for n in FIT_NAMES:
            assert res.values[n] > 0

    def test_nuts_smoke_on_pde_posterior(self):
        """Short NUTS run on the real PDE posterior: moves, stays in
        support, no divergences at coarse tolerance."""
        obs = make_observable_fn(**FAST)
        lp = make_log_posterior(obs)
        x0 = jnp.log(jnp.asarray([1.27, 3.12, 0.79, 4.67]))
        qs, info = run_nuts(lp, x0, jax.random.PRNGKey(0),
                            num_warmup=15, num_samples=15, max_depth=6,
                            init_step_size=0.5)
        qs = np.asarray(qs)
        assert np.isfinite(qs).all()
        # the chain explores (not stuck at the initial point)
        assert np.std(qs, axis=0).max() > 0.05


class TestDiagnostics:
    """Split R-hat / rank-normalized ESS / frozen-chain gate
    (``inference/diagnostics.py``) — the automated sampler health check
    the round-4 frozen exact run showed was missing."""

    def test_iid_chains_pass(self):
        rng = np.random.default_rng(0)
        qs = rng.normal(size=(4, 500, 3))
        from gab1_shp2_tpu.inference.diagnostics import check_chains

        rep = check_chains(qs, np.zeros((4, 500)))
        assert rep["ok"], rep["failures"]
        assert all(r < 1.02 for r in rep["rhat"].values())
        # iid draws: ESS should be close to the sample count
        assert all(e > 0.6 * 2000 for e in rep["ess"].values())

    def test_shifted_chain_fails_rhat(self):
        rng = np.random.default_rng(1)
        qs = rng.normal(size=(4, 500, 1))
        qs[0] += 5.0  # one chain stuck in a different mode
        from gab1_shp2_tpu.inference.diagnostics import check_chains

        rep = check_chains(qs)
        assert not rep["ok"]
        assert any("rhat" in f for f in rep["failures"])

    def test_frozen_chain_detected(self):
        """The literal round-4 signature: constant chains, 100%
        divergences.  R-hat is NaN (zero within-chain variance) and the
        unique-value guard fires — both mark the run not-ok."""
        qs = np.tile(np.arange(5.0)[:, None, None], (1, 400, 2))
        from gab1_shp2_tpu.inference.diagnostics import check_chains

        rep = check_chains(qs, np.ones((5, 400)))
        assert not rep["ok"]
        assert any("frozen" in f for f in rep["failures"])
        assert any("divergence rate" in f for f in rep["failures"])

    def test_ess_detects_autocorrelation(self):
        """AR(1) chains with rho=0.9 have ESS ~ N*(1-rho)/(1+rho) —
        the estimator must report far fewer effective samples than
        draws."""
        rng = np.random.default_rng(2)
        m, n, rho = 4, 2000, 0.9
        x = np.zeros((m, n))
        eps = rng.normal(size=(m, n)) * math.sqrt(1 - rho**2)
        for t in range(1, n):
            x[:, t] = rho * x[:, t - 1] + eps[:, t]
        from gab1_shp2_tpu.inference.diagnostics import ess

        e = ess(x)
        expected = m * n * (1 - rho) / (1 + rho)  # ~421
        assert 0.4 * expected < e < 2.5 * expected, e

    def test_ess_capped_for_antithetic(self):
        """Stan caps ESS at m*n*log10(m*n); a strongly antithetic
        chain (negative lag-1 autocorrelation) must not report an
        uncapped superefficient ESS."""
        rng = np.random.default_rng(3)
        m, n = 4, 1000
        x = np.zeros((m, n))
        eps = rng.normal(size=(m, n))
        for t in range(1, n):
            x[:, t] = -0.95 * x[:, t - 1] + eps[:, t]
        from gab1_shp2_tpu.inference.diagnostics import ess

        assert ess(x, rank_normalized=False) <= m * n * math.log10(m * n)

    def test_committed_posteriors_have_passing_diagnostics(self):
        """Every committed posterior_samples CSV must ship with a
        sibling nuts_diagnostics CSV whose health gate passed
        (``scripts/gen_nuts_diagnostics.py``) — the round-4 post-mortem
        proved plausible-looking quantiles can hide frozen chains."""
        import csv
        import glob
        import os

        base = os.path.join(os.path.dirname(__file__), "..", "results",
                            "inference")
        found = [p for p in glob.glob(f"{base}/**/posterior_samples*.csv",
                                      recursive=True)
                 if "_FAILED" not in p]
        assert found, "no committed posteriors?"
        for samples_path in found:
            tag = os.path.basename(samples_path)[
                len("posterior_samples"):-len(".csv")]
            diag = os.path.join(os.path.dirname(samples_path),
                                f"nuts_diagnostics{tag}.csv")
            assert os.path.exists(diag), f"missing diagnostics for " \
                f"{samples_path} — run scripts/gen_nuts_diagnostics.py"
            with open(diag) as f:
                rows = {r[0]: r[1] for r in csv.reader(f)}
            assert int(float(rows["_ok"])) == 1, f"{diag}: gate failed"


class TestPosteriorQuantileParity:
    """Committed NUTS artifacts vs the reference's Turing quantiles
    (``Turing results/Turing_res_5-chains_1000-spls_posteriors[_HeLa]_
    quantiles.csv``, produced by
    ``param_fitting+inference_finitediff.jl:411-444``).

    The reference posteriors are diffuse (95% CIs span 3-4 decades), so
    the parity criterion is *location*: medians within x/2 of the
    reference (measured agreement is within x1.26 on base; the exact-
    likelihood validation run agrees with the surrogate within x1.5 —
    see ``results/inference/exact_nuts/comparison_vs_surrogate.csv``),
    and the central-50% interval overlapping.  Skips when the artifact
    has not been generated yet (``workloads/fit_and_infer.py``).
    """

    @pytest.mark.parametrize("tag,ref_name", [
        ("", "Turing_res_5-chains_1000-spls_posteriors_quantiles.csv"),
        ("_hela",
         "Turing_res_5-chains_1000-spls_posteriors_HeLa_quantiles.csv"),
    ])
    def test_median_location(self, tag, ref_name):
        import csv
        import os

        here = os.path.dirname(__file__)
        mine_path = os.path.join(
            here, "..", "results", "inference",
            f"posterior_quantiles{tag}.csv")
        if not os.path.exists(mine_path):
            pytest.skip(f"artifact not generated: {mine_path}")
        ref_path = os.path.join(
            "/root/reference/Julia/Turing results", ref_name)

        def load(path, name_col, med_col, q25_col, q75_col):
            out = {}
            with open(path) as f:
                for row in csv.DictReader(f):
                    out[row[name_col]] = (float(row[med_col]),
                                          float(row[q25_col]),
                                          float(row[q75_col]))
            return out

        ref = load(ref_path, "parameters", "50.0%", "25.0%", "75.0%")
        mine = load(mine_path, "param", "q0.5", "q0.25", "q0.75")
        assert set(ref) == set(mine)
        for n, (rm, rlo, rhi) in ref.items():
            mm, mlo, mhi = mine[n]
            assert rm / 2.0 < mm < rm * 2.0, (n, mm, rm)
            # central-50% intervals overlap
            assert mlo < rhi and rlo < mhi, (n, (mlo, mhi), (rlo, rhi))


class TestExactVsSurrogatePosterior:
    """The amortized (Chebyshev-surrogate + exact-reweighting) posterior
    against a from-scratch exact-likelihood NUTS run (2 chains x 200
    samples, dr=0.2, CPU-pinned; ``scripts/run_exact_nuts_r3.sh``,
    mirroring ``param_fitting+inference_finitediff.jl:403-408``).

    This closes the validation gap the importance-ESS alone leaves
    open: the exact chain explores with the exact likelihood, so mass
    the surrogate chain never visits would show up here.  Committed
    round-3 run (2x200): medians agree within x1.48 (kSa, the
    flat-ridge direction), x1.11 elsewhere; all central-50% intervals
    overlap.  The gate scales with the run's draw count — the
    reference-scale 5x1000 run (``scripts/run_exact_nuts_r4.sh``,
    checkpointed/resumable, harvestable mid-run via
    ``scripts/harvest_exact_nuts_ckpt.py``) is held to x1.25 on
    medians (MC error of a lognormal-ish median shrinks ~1/sqrt(n);
    400 draws measured x1.48 worst => >=2500 draws supports x1.25)."""

    @pytest.mark.parametrize("run_dir,tag", [
        ("exact_nuts", ""), ("exact_nuts_r4", ""),
        ("exact_nuts_r5", ""), ("exact_nuts_r5_hela", "_hela")])
    def test_quantile_agreement(self, run_dir, tag):
        import csv
        import os

        here = os.path.dirname(__file__)
        base = os.path.join(here, "..", "results", "inference")
        exact_path = os.path.join(base, run_dir,
                                  f"posterior_quantiles{tag}.csv")
        sur_path = os.path.join(base, f"posterior_quantiles{tag}.csv")
        samples_path = os.path.join(base, run_dir,
                                    f"posterior_samples{tag}.csv")
        if not (os.path.exists(exact_path) and os.path.exists(sur_path)
                and os.path.exists(samples_path)):
            pytest.skip("exact-NUTS validation artifacts not generated")
        with open(samples_path) as f:
            n_draws = sum(1 for _ in f) - 1
        tol = 1.25 if n_draws >= 2500 else 2.0

        def load(path):
            out = {}
            with open(path) as f:
                for row in csv.DictReader(f):
                    out[row["param"]] = tuple(
                        float(row[q]) for q in ("q0.5", "q0.25", "q0.75"))
            return out

        exact, sur = load(exact_path), load(sur_path)
        assert set(exact) == set(sur)
        for n in exact:
            em, elo, ehi = exact[n]
            sm, slo, shi = sur[n]
            assert sm / tol < em < sm * tol, (n, em, sm, tol)
            assert elo < shi and slo < ehi, (n, (elo, ehi), (slo, shi))
