"""Priors pipeline tests: protocol functions, diffusivities, and
distributional agreement with the reference's shipped ensemble."""

import math

import numpy as np
import pytest

from gab1_shp2_tpu.models.species import PNAMES
from gab1_shp2_tpu.priors.diffusivity import estimate_diffusivities
from gab1_shp2_tpu.priors.literature import build_priors
from gab1_shp2_tpu.priors.posteriors import (
    best_fit_values,
    generate_ensemble,
    load_chain_csv,
)
from gab1_shp2_tpu.priors.protocol import (
    calc_mode_spread,
    create_lognorm_dist,
    multivariate3param,
    weighted_median,
)


class TestProtocol:
    def test_create_lognorm_dist(self):
        mu, sigma, xmin, xmax = create_lognorm_dist(10.0, 3.0)
        assert xmin == pytest.approx(10.0 / 3.0)
        assert xmax == pytest.approx(30.0)
        # mode of LogNormal(mu, sigma) is exp(mu - sigma^2) -- the
        # protocol sets mu = log(mode) + sigma^2
        assert math.exp(mu - sigma**2) == pytest.approx(10.0)
        # the mass in [xmin, xmax] equals the default percentage
        from scipy.stats import lognorm

        d = lognorm(s=sigma, scale=math.exp(mu))
        assert d.cdf(xmax) - d.cdf(xmin) == pytest.approx(0.6827, abs=1e-9)

    def test_weighted_median_basic(self):
        assert weighted_median([5.0], [1.0]) == 5.0
        assert weighted_median([1.0, 3.0], [1.0, 1.0]) == 2.0
        assert weighted_median([1.0, 3.0], [2.0, 1.0]) == 1.0
        # dominant-weight value wins
        assert weighted_median([1.0, 2.0, 10.0], [1.0, 10.0, 1.0]) == 2.0

    def test_calc_mode_spread_single_multiplicative(self):
        """One value with multiplicative error: Mode ~= value, Spread ~=
        error (the protocol's Gaussian binning reproduces them almost
        exactly)."""
        mode, spread = calc_mode_spread([[480.0, 1.1, 12.0, 1]])
        assert mode == pytest.approx(480.0, rel=1e-6)
        assert spread == pytest.approx(1.1, rel=1e-2)

    def test_calc_mode_spread_single_additive(self):
        mode, spread = calc_mode_spread([[100.0, 10.0, 12.0, 0]])
        # lognormal with additive sd 10%: mode of median-matched form
        lnE = math.sqrt(math.log(1 + 0.01))
        assert mode == pytest.approx(100.0 * math.exp(-0.5 * lnE**2),
                                     rel=1e-4)

    def test_multivariate3param_dependent_selection(self):
        # large-sigma Kd -> Kd dependent, (Kd, koff) representation
        d = multivariate3param(math.log(60.0), math.log(3.0),
                               math.log(1.6), math.log(1.1),
                               math.log(480.0), math.log(1.1))
        assert d.kind == "kd_koff"
        # Kd = koff/kon is enforced in the mean
        assert d.mu[0] == pytest.approx(math.log(480.0) - math.log(1.6))
        kf, kr = d.modes()
        assert kr == pytest.approx(480.0)
        assert kf == pytest.approx(1.6)
        # covariance is PSD and consistent with the dependency
        ev = np.linalg.eigvalsh(d.cov)
        assert (ev >= -1e-12).all()

    def test_mv_sampling_respects_structure(self):
        d = build_priors().mv["G2"]
        rng = np.random.default_rng(0)
        draws = d.sample(rng, 200_000)
        kf, kr = d.kf_kr(draws)
        # marginal medians match exp(mu)
        m1, m2 = d.modes()
        assert np.median(kr) == pytest.approx(m2, rel=0.01)
        assert np.median(kf) == pytest.approx(m1, rel=0.01)
        # log-space covariance matches the spec
        logd = np.log(draws)
        cov = np.cov(logd.T)
        np.testing.assert_allclose(cov, d.cov, rtol=0.05, atol=1e-4)


class TestDiffusivities:
    def test_values(self):
        """Rounded central values of the Stokes-radius pipeline
        (diffusivity_calculations.jl:91); tubulin's 5.3% relative
        uncertainty propagates to every species."""
        d = estimate_diffusivities()
        assert d["Dsfk"][0] == pytest.approx(84.0)
        assert d["Dg2"][0] == pytest.approx(136.0)
        assert d["Dg1"][0] == pytest.approx(67.0)
        assert d["Ds2"][0] == pytest.approx(80.0)
        # tubulin's ~5.3% relative uncertainty, rounded to whole um^2/min
        assert d["Dsfk"][1] == pytest.approx(4.0)
        assert d["Dg2"][1] == pytest.approx(7.0)
        assert d["Dg1"][1] == pytest.approx(4.0)
        for name, (val, err) in d.items():
            assert err / val == pytest.approx(0.053, abs=0.008)


class TestEnsembleGeneration:
    def test_prior_modes_match_reference_ensemble(self, reference_dir):
        """exp(mean(log)) of the reference's shipped 5000-member ensemble
        estimates each prior's exp(mu); our exact pipeline must agree
        within that estimator's Monte-Carlo error."""
        import pandas as pd

        ref = pd.read_csv(f"{reference_dir}/Julia/parameter_ensemble.csv")
        bp = build_priors().baseline_pvals()
        for name in PNAMES:
            if name in ("kG1p", "kG1dp", "kSa", "kSi"):
                continue  # posterior columns, not prior draws
            ref_gm = float(np.exp(np.log(ref[name]).mean()))
            assert bp[name] == pytest.approx(ref_gm, rel=0.05), name

    def test_generated_ensemble_distribution(self, reference_dir):
        """Our generated prior+posterior ensemble must match the
        reference's shipped ensemble in log-mean and log-sd per column."""
        chain = load_chain_csv(
            f"{reference_dir}/Julia/Turing results/"
            "Turing_res_5-chains_1000-spls_posteriors.csv")
        ens = generate_ensemble(chain, n=4000,
                                rng=np.random.default_rng(7))
        assert ens.shape == (4000, 24)
        import pandas as pd

        ref = pd.read_csv(
            f"{reference_dir}/Julia/parameter_ensemble.csv")
        for i, name in enumerate(PNAMES):
            if name == "EGF":
                np.testing.assert_allclose(ens[:, i], 1.67e-3)
                continue
            lm, ls = np.log(ens[:, i]).mean(), np.log(ens[:, i]).std()
            rm, rs = np.log(ref[name]).mean(), np.log(ref[name]).std()
            assert lm == pytest.approx(rm, abs=max(0.08, 4 * rs / 63)), name
            assert ls == pytest.approx(rs, rel=0.10), name

    def test_best_fit_values(self, reference_dir):
        """exp(median(log chain)) must reproduce the reference's 50%
        posterior quantiles (get_param_posteriors.jl:17-20)."""
        chain = load_chain_csv(
            f"{reference_dir}/Julia/Turing results/"
            "Turing_res_5-chains_1000-spls_posteriors.csv")
        bf = best_fit_values(chain)
        assert bf["kG1p"] == pytest.approx(1.2665193312817182, rel=1e-6)
        assert bf["kG1dp"] == pytest.approx(3.1179166468335158, rel=1e-6)
        assert bf["kSa"] == pytest.approx(0.7924254367778611, rel=1e-6)
        assert bf["kSi"] == pytest.approx(4.665684502848428, rel=1e-6)

    def test_prior_only_ensemble(self):
        ens = generate_ensemble(None, n=256, rng=np.random.default_rng(1))
        assert ens.shape == (256, 24)
        assert (ens > 0).all()
