"""Utility-subsystem and Pallas-kernel tests."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gab1_shp2_tpu import base_system, default_co, default_params, solve_explicit
from gab1_shp2_tpu.models.params import Params


class TestCache:
    def test_compute_or_load_roundtrip(self, tmp_path):
        from gab1_shp2_tpu.utils.cache import compute_or_load

        calls = []

        def compute():
            calls.append(1)
            return {"x": np.arange(5.0), "y": np.ones((2, 2))}

        cfg = {"dr": 0.2, "n": 10}
        a = compute_or_load("t", cfg, compute, cache_dir=str(tmp_path))
        b = compute_or_load("t", cfg, compute, cache_dir=str(tmp_path))
        assert len(calls) == 1  # second call loaded
        np.testing.assert_array_equal(a["x"], b["x"])
        # different config recomputes
        compute_or_load("t", {"dr": 0.1, "n": 10}, compute,
                        cache_dir=str(tmp_path))
        assert len(calls) == 2
        # force recomputes
        compute_or_load("t", cfg, compute, cache_dir=str(tmp_path),
                        force=True)
        assert len(calls) == 3

    def test_checkpointer(self, tmp_path):
        from gab1_shp2_tpu.utils.cache import Checkpointer

        ck = Checkpointer("test", {"a": 1}, cache_dir=str(tmp_path),
                          every=0.0)
        assert ck.restore() is None
        ck.save({"i": np.int64(7), "state": np.zeros(3)})
        got = ck.restore()
        assert int(got["i"]) == 7
        ck.clear()
        assert ck.restore() is None


class TestProgress:
    def test_progress_iterates(self):
        from gab1_shp2_tpu.utils.progress import progress

        assert list(progress(range(5), desc="t", every=100.0)) == list(range(5))

    def test_timer(self):
        from gab1_shp2_tpu.utils.progress import timer

        with timer("noop"):
            pass


class TestPallasKernel:
    def test_matches_xla_explicit(self):
        """The fused kernel (interpret mode on CPU) must reproduce the
        f64 XLA explicit path to f32 precision."""
        from gab1_shp2_tpu.ops.explicit_pallas import solve_explicit_pallas

        sys_ = base_system()
        co = default_co()
        p0 = default_params()
        pb = Params(D=jnp.stack([p0.D, p0.D]),
                    k=jnp.stack([p0.k, p0.k * 1.05]))
        C, m = solve_explicit_pallas(sys_, co, pb, dr=0.5, tf=0.5,
                                     maxiters=20, block=2)
        assert C.shape == (2, 10, 21)
        for i, pk in enumerate([p0, Params(D=p0.D, k=p0.k * 1.05)]):
            ref = solve_explicit(sys_, co, pk, dr=0.5, tf=0.5, Nts=2,
                                 maxiters=20, tol=0.0)
            np.testing.assert_allclose(
                np.asarray(C[i], dtype=np.float64),
                np.asarray(ref.C[-1]), rtol=3e-5, atol=1e-4)
            np.testing.assert_allclose(
                np.asarray(m[i], dtype=np.float64),
                np.asarray(ref.m[-1]), rtol=3e-5, atol=1e-6)

    def test_rect_geometry(self):
        from gab1_shp2_tpu import rect_system
        from gab1_shp2_tpu.ops.explicit_pallas import solve_explicit_pallas

        co = default_co()
        p0 = default_params()
        pb = Params(D=p0.D[None], k=p0.k[None])
        C, m = solve_explicit_pallas(rect_system(), co, pb, dr=0.5,
                                     tf=0.2, maxiters=20, block=1)
        ref = solve_explicit(rect_system(), co, p0, dr=0.5, tf=0.2,
                             Nts=2, maxiters=20, tol=0.0)
        np.testing.assert_allclose(np.asarray(C[0], dtype=np.float64),
                                   np.asarray(ref.C[-1]), rtol=3e-5,
                                   atol=1e-4)

    def test_grid_too_large_raises(self):
        from gab1_shp2_tpu.ops.explicit_pallas import solve_explicit_pallas

        p0 = default_params()
        pb = Params(D=p0.D[None], k=p0.k[None])
        with pytest.raises(ValueError, match="128-lane"):
            solve_explicit_pallas(base_system(), default_co(), pb,
                                  dr=0.05, tf=0.1)


class TestStats:
    def test_jzs_bayes_factor(self):
        from gab1_shp2_tpu.utils.stats import hedges_g, jzs_ttest_bf10

        rng = np.random.default_rng(0)
        a = rng.normal(0.0, 1.0, 200)
        # strong separation -> decisive evidence for a difference
        assert jzs_ttest_bf10(a, rng.normal(2.0, 1.0, 200)) > 1e6
        # same distribution -> evidence favors the null
        assert jzs_ttest_bf10(a, rng.normal(0.0, 1.0, 200)) < 1.0
        assert abs(hedges_g(a, a + 1.0) + 1.0) < 0.05
