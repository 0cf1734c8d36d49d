"""GSA correctness tests.

The estimators are validated on the Ishigami function (known analytic
Sobol indices) before being trusted on the PDE — a check the reference
delegates to GlobalSensitivity.jl's own test suite.
"""

import numpy as np
import pytest

from gab1_shp2_tpu.gsa.efast import efast_design, efast_indices, log_bounds_around
from gab1_shp2_tpu.gsa.sobol import sobol_design, sobol_indices

A, B = 7.0, 0.1


def ishigami(X):
    return (np.sin(X[:, 0]) + A * np.sin(X[:, 1]) ** 2
            + B * X[:, 2] ** 4 * np.sin(X[:, 0]))


def ishigami_analytic():
    V = A**2 / 8 + B * np.pi**4 / 5 + B**2 * np.pi**8 / 18 + 0.5
    V1 = 0.5 * (1 + B * np.pi**4 / 5) ** 2
    V2 = A**2 / 8
    VT3 = 8 * B**2 * np.pi**8 / 225
    S1 = np.array([V1 / V, V2 / V, 0.0])
    ST = np.array([(V1 + VT3) / V, V2 / V, VT3 / V])
    return S1, ST


BOUNDS = np.array([[-np.pi, np.pi]] * 3)


class TestEFAST:
    def test_ishigami(self):
        """Known analytic Sobol indices of the Ishigami function; 32
        resample curves with the pooled estimator (see efast_indices)."""
        d = efast_design(BOUNDS, 2049, log_space=False, resamples=32,
                         rng=np.random.default_rng(3))
        Y = ishigami(d.X)
        S1, ST = efast_indices(Y, d)
        S1a, STa = ishigami_analytic()
        np.testing.assert_allclose(S1[:, 0], S1a, atol=0.03)
        np.testing.assert_allclose(ST[:, 0], STa, atol=0.06)

    def test_design_shape_and_bounds(self):
        bounds = np.array([[0.1, 10.0], [1.0, 100.0]])
        d = efast_design(bounds, 65, log_space=True,
                         rng=np.random.default_rng(0))
        assert d.X.shape == (130, 2)
        assert (d.X[:, 0] >= 0.1 - 1e-12).all()
        assert (d.X[:, 0] <= 10.0 + 1e-12).all()
        assert (d.X[:, 1] >= 1.0 - 1e-12).all()

    def test_multi_output(self):
        d = efast_design(BOUNDS, 513, log_space=False,
                         rng=np.random.default_rng(1))
        Y = np.stack([ishigami(d.X), 2.0 * ishigami(d.X)], axis=1)
        S1, ST = efast_indices(Y, d)
        # indices are scale-invariant
        np.testing.assert_allclose(S1[:, 0], S1[:, 1], atol=1e-12)

    def test_constant_output_gives_zeros(self):
        d = efast_design(BOUNDS, 129, log_space=False,
                         rng=np.random.default_rng(2))
        S1, ST = efast_indices(np.ones(d.X.shape[0]), d)
        assert (S1 == 0).all() and (ST == 0).all()

    def test_log_bounds(self):
        b = log_bounds_around(np.array([2.0]), 1000.0)
        np.testing.assert_allclose(b, [[0.002, 2000.0]])


class TestSobol:
    def test_ishigami(self):
        d = sobol_design(BOUNDS, 4096, log_space=False, seed=0)
        Y = ishigami(d.X)
        S1, ST = sobol_indices(Y, d)
        S1a, STa = ishigami_analytic()
        np.testing.assert_allclose(S1[:, 0], S1a, atol=0.02)
        np.testing.assert_allclose(ST[:, 0], STa, atol=0.02)


class TestPDEIntegration:
    def test_small_efast_on_model(self):
        """A tiny eFAST sweep on the real PDE: structure + the one
        robust qualitative expectation (aSFK length scales respond to
        Dsfk and kSi)."""
        import jax

        from gab1_shp2_tpu import base_system, default_co, default_params
        from gab1_shp2_tpu.gsa.runner import (
            dk_bounds,
            make_param_evaluator,
            run_efast,
        )

        p = default_params()
        ev = make_param_evaluator(base_system(), default_co(), dr=0.5,
                                  tf=1.0, rtol=1e-3, atol=1e-6, chunk=64)
        # vary only a 4-parameter subset to keep this test fast:
        # [Dsfk, kSa, kSi, kG1f] around baseline, others pinned
        idx = [0, 15, 16, 9]
        base = np.asarray(p.pack())
        sub_bounds = log_bounds_around(base[idx], 30.0)

        def sub_eval(Xsub):
            X = np.repeat(base[None, :], len(Xsub), axis=0)
            X[:, idx] = Xsub
            return ev(X)

        S1, ST, design = run_efast(sub_eval, sub_bounds, samples=65,
                                   seed=5)
        assert S1.shape == (4, 6) and ST.shape == (4, 6)
        assert np.isfinite(S1).all() and np.isfinite(ST).all()
        # r1/2 of aSFK (output 0) must be sensitive to SFK
        # inactivation kinetics (kSi, row 2): delta = sqrt(D/k)
        assert ST[2, 0] > 0.05


# mapping from the reference's bracketed concentration labels to ours
_CONC_MAP = {"[SFK]": "CoSFK", "[GRB2]": "CoG2", "[GAB1]": "CoG1",
             "[SHP2]": "CoS2", "[EGFR]": "CoEGFR"}

_GSA_SETS = {
    "dk": ("eFAST_dk_1000spls_ST.csv",
           "eFAST-GSA-res_diffs+kinetic-params_1000-spls-per-param_ST.csv"),
    "dk_membsfk": (
        "eFAST_dk_membsfk_1000spls_ST.csv",
        "eFAST-GSA-res_diffs+kinetic-params_memb-SFKs_"
        "1000-spls-per-param_ST.csv"),
    "concs": ("eFAST_concs_1000spls_ST.csv",
              "eFAST-GSA-res_concs_1000-spls-per-param_ST.csv"),
    "concs_membsfk": (
        "eFAST_concs_membsfk_1000spls_ST.csv",
        "eFAST-GSA-res_concs_memb-SFKs_1000-spls-per-param_ST.csv"),
}


class TestReferenceRankings:
    @pytest.mark.parametrize("which", list(_GSA_SETS))
    def test_efast_artifact_matches_reference_rankings(self, which,
                                                       reference_dir):
        """Every committed full-scale eFAST artifact must rank
        parameters like the reference's shipped results: Spearman on ST
        for the headline outputs, plus top-set agreement.  The concs
        sets have only 5 parameters, so the check there is top-2
        agreement on the headline output."""
        import os

        art_name, ref_name = _GSA_SETS[which]
        art = f"results/{art_name}"
        if not os.path.exists(art):
            pytest.skip("artifact not present")
        import pandas as pd
        from scipy.stats import spearmanr

        ref = pd.read_csv(
            f"{reference_dir}/Julia/GSA results/{ref_name}")
        ref["param"] = ref["param"].map(lambda s: _CONC_MAP.get(s, s))
        ref = ref.set_index("param")
        mine = pd.read_csv(art).set_index("param")

        if which.startswith("concs"):
            top_ref = set(ref["[pG1S2]_average"].nlargest(2).index)
            top_mine = set(mine["[pG1S2]_average"].nlargest(2).index)
            assert top_ref == top_mine, (top_ref, top_mine)
            return

        # thresholds tightened to what the committed rodas4-regenerated
        # artifacts support (measured 2026-08-19: average 0.84/0.91,
        # r_1/2 0.90/0.92, cent:surf 0.85/0.73 for dk/dk_membsfk) so a
        # substantive estimator regression actually trips the gate
        for col, min_rho in (("[pG1S2]_average", 0.8),
                             ("[pG1S2]_cent:surf", 0.7),
                             ("r_1/2, pG1S2", 0.85)):
            a = mine[col].reindex(ref.index).values
            rho = spearmanr(a, ref[col].values).statistic
            assert rho > min_rho, (col, rho)
        # headline output: top-3 sets coincide
        top_ref = set(ref["[pG1S2]_average"].nlargest(3).index)
        top_mine = set(mine["[pG1S2]_average"].nlargest(3).index)
        assert top_ref == top_mine
