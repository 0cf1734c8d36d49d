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


class TestMembraneFixedPointAtCorners:
    def test_fixed_iterations_converge_at_gsa_corners(self):
        """The Pallas kernel replaces the reference's tolerance-looped
        membrane fixed point (basepdesolver.jl:197-242) with a fixed
        iteration count.  Round-1 validated the contraction only at
        baseline parameters; this drives the same fp map at x1000-bounds
        GSA corner draws from a COLD start (harder than the kernel's
        warm start from the previous step's values) and asserts
        (a) 2x the kernel default iteration count reaches the f32 noise
        floor, and (b) the contraction rate beyond the default count is
        <=0.5x/iteration, so the kernel's per-time-step warm-start
        damping (~rate^maxiters) kills any cold-start residual within
        two steps.  Measured profile (2026-08-16): residual stalls at
        1.7e-3 through iteration 4, then contracts ~0.4x/iter, 2e-6 by
        iteration 12 — this is why the kernel default is 8, not 4."""
        from gab1_shp2_tpu.gsa.runner import dk_bounds
        from gab1_shp2_tpu.models.params import stability_dt
        from gab1_shp2_tpu.models.species import N_CYTO, N_MEMB
        from gab1_shp2_tpu.ops.rhs import (
            bc_closure,
            effective_diffusivities,
            kdict,
            memb_rates,
        )

        system = base_system()
        Co = np.asarray(default_co(), np.float32)
        dr = 0.2
        rng = np.random.default_rng(42)
        bounds = np.asarray(dk_bounds(default_params()))
        # 256 log-uniform corner-region draws
        lo, hi = np.log(bounds[:, 0]), np.log(bounds[:, 1])
        draws = np.exp(lo + (hi - lo) * rng.random((256, 24)))
        pb = Params.unpack(jnp.asarray(draws, jnp.float32))
        dt = stability_dt(pb, dr).astype(jnp.float32)      # (B,)

        # representative near-membrane state: uniform initial condition
        C_near = jnp.broadcast_to(
            jnp.asarray([Co[0], Co[1], Co[2], Co[3], 0, 0, 0, 0, 0, 0],
                        jnp.float32), (256, N_CYTO))
        m = jnp.zeros((256, N_MEMB), jnp.float32).at[:, 0].set(Co[4])
        d_eff = jax.vmap(
            lambda p: effective_diffusivities(system, p))(pb)

        def fp_iter(carry, _):
            CR, mm = carry
            CR_new = jax.vmap(
                lambda cn, mi, kb, de: bc_closure(
                    system, cn, mi, kdict(kb), de, dr)
            )(C_near, mm, pb.k, d_eff)
            m_new = m + dt[:, None] * jax.vmap(
                lambda mi, cr, kb: memb_rates(system, mi, cr, kdict(kb))
            )(mm, CR_new, pb.k)
            return (CR_new, m_new), None

        from gab1_shp2_tpu.ops import explicit_pallas
        import inspect
        default_iters = inspect.signature(
            explicit_pallas.solve_explicit_pallas
        ).parameters["maxiters"].default

        cold = (jnp.zeros_like(C_near), jnp.zeros_like(m))
        (cr50, m50), _ = jax.lax.scan(fp_iter, cold, None, length=50)
        scale = np.abs(np.asarray(cr50)) + 1e-3

        carry = cold
        errs = []
        for _ in range(2 * default_iters):
            carry, _ = fp_iter(carry, None)
            errs.append(
                (np.abs(np.asarray(carry[0]) - np.asarray(cr50)) / scale)
                .max())
        assert np.isfinite(np.asarray(cr50)).all()
        # (a) twice the default budget reaches the f32 noise floor
        assert errs[-1] < 1e-4, errs[-1]
        # (b) contraction beyond the default count is at least 2x/iter,
        # so warm-start damping per time step is <= 0.5**default_iters
        tail = [e for e in errs[default_iters - 1:] if e > 1e-6]
        for a, b in zip(tail, tail[1:]):
            assert b <= 0.5 * a + 1e-7, (a, b)
