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


class TestFusedRos23Step:
    @pytest.mark.parametrize("variant", ["base", "rect", "memb_sfk"])
    def test_inkernel_bands_match_fast_jacobian(self, variant):
        """The Mosaic-safe in-kernel band builder (iota metric, masked
        edge updates) must equal fast_block_jacobian_lanes to fp
        roundoff when evaluated as plain JAX, for every system
        variant."""
        import gab1_shp2_tpu as g
        from gab1_shp2_tpu.ops.jacobian import fast_block_jacobian_lanes
        from gab1_shp2_tpu.ops.ros23_pallas import _bands_lanes_kernel

        sys_ = {"base": g.base_system, "rect": g.rect_system,
                "memb_sfk": g.memb_sfk_system}[variant]()
        rng = np.random.default_rng(2)
        B, R, dr = 3, 10.0, 1.0
        Nr = int(round(R / dr))
        NB = Nr
        p0 = np.asarray(default_params().pack())
        pb = Params.unpack(jnp.asarray(
            p0[None] * np.exp(rng.normal(0, 0.2, (B, 24))), jnp.float32))
        y = jnp.asarray(rng.uniform(0.1, 5.0, (NB, 10, B)), jnp.float32)
        r = jnp.arange(Nr + 1, dtype=jnp.float32) * dr

        from gab1_shp2_tpu.ops.rhs import effective_diffusivities
        ref = fast_block_jacobian_lanes(sys_, y, pb, r, dr)
        d_eff = effective_diffusivities(sys_, pb)
        new = _bands_lanes_kernel(sys_, Nr, dr)(y, pb.k, d_eff)
        for a, b, name in zip(ref, new, ("lower", "diag", "upper")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-5,
                                       err_msg=name)

    def test_fused_step_solver_parity(self):
        """solve_stiff_batch with step_impl='pallas' (interpret mode on
        CPU) must agree with the XLA step to integration tolerance.
        Band construction, factorization, stage solves and RHS all run
        in-kernel; op-order differences under the adaptive controller
        allow tolerance-level divergence only."""
        from gab1_shp2_tpu import solve_stiff_batch

        sys_ = base_system()
        Co = jnp.asarray(default_co(), jnp.float32)
        p0 = np.asarray(default_params().pack())
        rng = np.random.default_rng(5)
        pb = Params.unpack(jnp.asarray(
            p0[None] * np.exp(rng.normal(0, 0.1, (4, 24))), jnp.float32))
        kw = dict(dr=1.0, tf=1.0, Nts=2, rtol=1e-4, atol=1e-7,
                  method="rosenbrock23", return_stats=True)
        ref, sr = solve_stiff_batch(sys_, Co, pb, step_impl="xla", **kw)
        fus, sf = solve_stiff_batch(sys_, Co, pb, step_impl="pallas",
                                    **kw)
        assert not np.asarray(sf.failed).any()
        Cr = np.asarray(ref.C[:, -1], np.float64)
        Cf = np.asarray(fus.C[:, -1], np.float64)
        err = np.max(np.abs(Cf - Cr) / (np.abs(Cr) + 1e-6))
        assert err < 2e-3, err


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
        iteration count; round-1 validated the contraction only at
        baseline parameters.  This probes the kernel's EXACT map
        (m_new = m_prev + dt*rates(m_prev, bc(mm)) -- the iterate feeds
        back only through dt-scaled membrane rates) at x1000-bounds GSA
        corner draws, at a MID-TRANSIENT state (t=0 is trivially
        converged because the membrane is unstimulated): drive each lane
        300 steps with the tolerance-looped XLA solver, then fixed-point
        iterate one further step.  Asserts the kernel's warm start (the
        previous step's membrane values, as carried in-kernel) reaches
        <=3e-5 relative residual within the default iteration count.
        Measured profile (2026-08-16, B=32, 500 steps): warm 7.5e-3 ->
        1.7e-4 -> 3.7e-5 -> 1.0e-5; contraction ~0.3x/iteration."""
        import inspect

        from gab1_shp2_tpu.gsa.runner import dk_bounds
        from gab1_shp2_tpu.models.params import stability_dt
        from gab1_shp2_tpu.ops import explicit_pallas
        from gab1_shp2_tpu.ops.explicit import solve_explicit
        from gab1_shp2_tpu.ops.rhs import (
            bc_closure,
            effective_diffusivities,
            kdict,
            memb_rates,
        )

        default_iters = inspect.signature(
            explicit_pallas.solve_explicit_pallas
        ).parameters["maxiters"].default

        system = base_system()
        Co = np.asarray(default_co(), np.float32)
        dr = 0.2
        B, n_pre = 6, 300
        rng = np.random.default_rng(42)
        bounds = np.asarray(dk_bounds(default_params()))
        lo, hi = np.log(bounds[:, 0]), np.log(bounds[:, 1])
        draws = np.exp(lo + (hi - lo) * rng.random((B, 24)))
        pb = Params.unpack(jnp.asarray(draws, jnp.float32))
        dts = np.asarray(stability_dt(pb, dr))

        # mid-transient states from the exact tolerance-looped solver
        Cs, ms = [], []
        for i in range(B):
            p = Params.unpack(jnp.asarray(draws[i], jnp.float32))
            sol = solve_explicit(system, jnp.asarray(Co), p, dr=dr,
                                 tf=float(n_pre * dts[i]), Nts=2,
                                 maxiters=100, tol=0.0)
            Cs.append(np.asarray(sol.C[-1]))
            ms.append(np.asarray(sol.m[-1]))
        Cs = jnp.asarray(np.stack(Cs))
        m_prev = jnp.asarray(np.stack(ms))
        C_near = Cs[:, :, -2]
        CR_warm = Cs[:, :, -1]
        dt = jnp.asarray(dts, jnp.float32)
        d_eff = jax.vmap(
            lambda p: effective_diffusivities(system, p))(pb)

        def fp_iter(carry):
            CR, mm = carry
            CR_new = jax.vmap(
                lambda cn, mi, kb, de: bc_closure(
                    system, cn, mi, kdict(kb), de, dr)
            )(C_near, mm, pb.k, d_eff)
            m_new = m_prev + dt[:, None] * jax.vmap(
                lambda mp, cr, kb: memb_rates(system, mp, cr, kdict(kb))
            )(m_prev, CR_new, pb.k)
            return (CR_new, m_new)

        ref = (CR_warm, m_prev)
        for _ in range(60):
            ref = fp_iter(ref)
        assert np.isfinite(np.asarray(ref[0])).all()
        scale = np.abs(np.asarray(ref[0])) + 1e-3

        carry = (CR_warm, m_prev)
        errs = []
        for _ in range(default_iters):
            carry = fp_iter(carry)
            errs.append(
                (np.abs(np.asarray(carry[0]) - np.asarray(ref[0]))
                 / scale).max())
        # warm start + default count reaches the f32 noise floor
        assert errs[-1] < 3e-5, errs
        # and contracts monotonically towards it
        for a, b in zip(errs, errs[1:]):
            assert b <= 0.6 * a + 1e-7, errs
