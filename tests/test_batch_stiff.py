"""Batch-aware (lane-minor) stiff integrator vs the vmapped reference path.

The two integrators share controller arithmetic, so trajectories must
agree to float roundoff and step counts must match exactly — any drift
means the lane-minor linear algebra or masking diverged from the
per-lane semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gab1_shp2_tpu as g
from gab1_shp2_tpu.models.params import Params
from gab1_shp2_tpu.ops.batch_stiff import (
    block_jacobian_lanes,
    cr_factor_lanes,
    cr_solve_lanes,
    gj_inv_lanes,
    make_mol_rhs_lanes,
    mm_lanes,
    solve_stiff_batch,
)


def _param_batch(B, spread=0.2, seed=0):
    rng = np.random.default_rng(seed)
    p0 = np.asarray(g.default_params().pack())
    return Params.unpack(
        jnp.asarray(p0[None, :] * np.exp(rng.normal(0, spread, (B, 24)))))


class TestLaneLinalg:
    def test_gj_inv(self):
        rng = np.random.default_rng(1)
        A = rng.normal(size=(5, 6, 6, 7)) + 6 * np.eye(6)[None, :, :, None]
        Ainv = np.asarray(gj_inv_lanes(jnp.asarray(A)))
        for i in range(5):
            for b in range(7):
                np.testing.assert_allclose(
                    Ainv[i, :, :, b], np.linalg.inv(A[i, :, :, b]),
                    rtol=1e-9, atol=1e-9)

    def test_mm(self):
        rng = np.random.default_rng(2)
        A = rng.normal(size=(3, 4, 5, 6))
        B = rng.normal(size=(3, 5, 4, 6))
        got = np.asarray(mm_lanes(jnp.asarray(A), jnp.asarray(B)))
        want = np.einsum("nijb,njkb->nikb", A, B)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)

    def test_cr_solve(self):
        rng = np.random.default_rng(3)
        NB, n, B = 9, 4, 5
        L = rng.normal(size=(NB, n, n, B)) * 0.1
        U = rng.normal(size=(NB, n, n, B)) * 0.1
        D = rng.normal(size=(NB, n, n, B)) + 4 * np.eye(n)[None, :, :, None]
        b = rng.normal(size=(NB, n, B))
        fac = cr_factor_lanes(*map(jnp.asarray, (L, D, U)))
        x = np.asarray(cr_solve_lanes(fac, jnp.asarray(b)))
        for lane in range(B):
            M = np.zeros((NB * n, NB * n))
            for i in range(NB):
                M[i * n:(i + 1) * n, i * n:(i + 1) * n] = D[i, :, :, lane]
                if i > 0:
                    M[i * n:(i + 1) * n, (i - 1) * n:i * n] = L[i, :, :, lane]
                if i < NB - 1:
                    M[i * n:(i + 1) * n,
                      (i + 1) * n:(i + 2) * n] = U[i, :, :, lane]
            want = np.linalg.solve(M, b[:, :, lane].ravel())
            np.testing.assert_allclose(x[:, :, lane].ravel(), want,
                                       rtol=1e-8, atol=1e-8)


class TestLaneRHSJacobian:
    def test_rhs_matches_vmapped(self):
        system = g.base_system()
        Co = g.default_co()
        pb = _param_batch(3)
        R, dr = 10.0, 1.0
        Nr = int(round(R / dr))
        from gab1_shp2_tpu.ops.rhs import initial_state
        from gab1_shp2_tpu.ops.jacobian import state_to_blocks
        from gab1_shp2_tpu.ops.trbdf2 import _rhs_blocks_fn

        y0s = initial_state(Co, Nr)
        y0 = state_to_blocks(y0s.C_int, y0s.m) + 0.1
        yb = jnp.broadcast_to(y0[..., None], y0.shape + (3,))

        f_lanes, _ = make_mol_rhs_lanes(system, R, dr)
        f_ref, _ = _rhs_blocks_fn(system, R, dr)
        got = np.asarray(f_lanes(yb, pb))
        want = np.asarray(
            jax.vmap(lambda p: f_ref(y0, p), out_axes=-1)(pb))
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)

        from functools import partial

        L, D, U = block_jacobian_lanes(partial(f_lanes, params=pb), yb)
        from gab1_shp2_tpu.ops.jacobian import block_jacobian

        Lv, Dv, Uv = jax.vmap(
            lambda p: block_jacobian(partial(f_ref, params=p), y0),
            out_axes=-1)(pb)
        np.testing.assert_allclose(np.asarray(L), np.asarray(Lv),
                                   rtol=1e-10, atol=1e-10)
        np.testing.assert_allclose(np.asarray(D), np.asarray(Dv),
                                   rtol=1e-10, atol=1e-10)
        np.testing.assert_allclose(np.asarray(U), np.asarray(Uv),
                                   rtol=1e-10, atol=1e-10)


class TestBatchSolve:
    @pytest.mark.parametrize("method", ["rosenbrock23", "trbdf2"])
    def test_matches_vmapped(self, method):
        system = g.base_system()
        Co = g.default_co()
        pb = _param_batch(4, spread=0.25)
        kw = dict(dr=0.5, tf=2.0, Nts=4, rtol=1e-5, atol=1e-8,
                  method=method)
        # jac_reuse=False: this test pins the layout transformation
        # (lane-minor vs vmap) to BIT-level parity; the reuse path is
        # tolerance-level by design (test_jac_reuse_accuracy)
        solb, statb = solve_stiff_batch(system, Co, pb, return_stats=True,
                                        jac_reuse=False, **kw)
        solv, statv = jax.vmap(lambda p: g.solve_stiff(
            system, Co, p, return_stats=True, **kw))(pb)
        np.testing.assert_allclose(np.asarray(solb.C), np.asarray(solv.C),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(solb.m), np.asarray(solv.m),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_array_equal(np.asarray(statb.n_accepted),
                                      np.asarray(statv.n_accepted))
        assert not np.asarray(statb.failed).any()

    def test_batched_co(self):
        system = g.base_system()
        Co = np.asarray(g.default_co())
        Cob = jnp.asarray(np.stack([Co, Co * 0.5]))
        pb = _param_batch(2, spread=0.0)
        sol = solve_stiff_batch(system, Cob, pb, dr=1.0, tf=0.5, Nts=2,
                                rtol=1e-4, atol=1e-7, jac_reuse=False)
        ref0 = g.solve_stiff(system, jnp.asarray(Co), Params.unpack(
            pb.pack()[0]), dr=1.0, tf=0.5, Nts=2, rtol=1e-4, atol=1e-7)
        ref1 = g.solve_stiff(system, jnp.asarray(Co * 0.5), Params.unpack(
            pb.pack()[1]), dr=1.0, tf=0.5, Nts=2, rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(np.asarray(sol.C[0]), np.asarray(ref0.C),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(sol.C[1]), np.asarray(ref1.C),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(sol.CoEGFR),
                                   [Co[4], 0.5 * Co[4]])

    def test_pulse_chase_legs(self):
        system = g.base_system()
        Co = g.default_co()
        pb = _param_batch(2, spread=0.1)
        kw = dict(dr=1.0, tf=2.0, Nts=4, rtol=1e-4, atol=1e-7,
                  t_prechase=1.0)
        solb = solve_stiff_batch(system, Co, pb, jac_reuse=False, **kw)
        solv = jax.vmap(lambda p: g.solve_stiff(system, Co, p, **kw))(pb)
        np.testing.assert_allclose(np.asarray(solb.C), np.asarray(solv.C),
                                   rtol=1e-9, atol=1e-9)

    def test_failure_masking(self):
        """A poisoned lane (absurd rates) fails without corrupting others."""
        system = g.base_system()
        Co = g.default_co()
        pb = _param_batch(3, spread=0.0)
        packed = np.array(pb.pack())
        packed[1, 7:] *= 1e12  # blow up one lane's kinetics
        pb = Params.unpack(jnp.asarray(packed))
        sol, stats = solve_stiff_batch(system, Co, pb, dr=1.0, tf=1.0,
                                       Nts=2, rtol=1e-5, atol=1e-8,
                                       max_steps=2000, return_stats=True)
        ok = ~np.asarray(stats.failed)
        assert ok[0] and ok[2]
        assert np.isfinite(np.asarray(sol.C[0])).all()
        assert np.isfinite(np.asarray(sol.C[2])).all()


    def test_jac_reuse_accuracy(self):
        """The opt-in TRBDF2 Jacobian-band-reuse path must agree with
        the exact-refresh path (the default) to integration tolerance
        and lose no lanes.  Staleness only affects Newton convergence, so
        both converge to the same step solutions; trajectories differ
        (Newton iteration counts shift step acceptance) but solutions
        agree to ~rtol."""
        system = g.base_system()
        Co = g.default_co()
        pb = _param_batch(6, spread=0.25)
        kw = dict(dr=0.5, tf=2.0, Nts=2, rtol=1e-5, atol=1e-8,
                  method="trbdf2", return_stats=True)
        ref, sr = solve_stiff_batch(system, Co, pb, jac_reuse=False, **kw)
        new, sn = solve_stiff_batch(system, Co, pb, jac_reuse=True, **kw)
        assert not np.asarray(sn.failed).any()
        Cr = np.asarray(ref.C[:, -1])
        Cn = np.asarray(new.C[:, -1])
        err = np.max(np.abs(Cn - Cr) / (np.abs(Cr) + 1e-6))
        assert err < 5e-4, err

    def test_bf16_linsolve_trbdf2(self):
        """bfloat16 W-factors are valid for TRBDF2: the factorization
        only preconditions Newton (the iteration converges to the exact
        step solution from the f32 residual), so precision costs a few
        extra Newton/step rejections, not accuracy.  NOT valid for
        Rosenbrock23 at *bf16* precision: its stage solves enter the
        solution directly, and bf16's ~1e-2 factor perturbation
        exceeds the rtol-1e-4 budget (an f32 factorization's ~1e-7
        perturbation does not — see test_f32_linsolve_rosenbrock23)."""
        system = g.base_system()
        Co = g.default_co().astype(jnp.float32)
        pb = _param_batch(6, spread=0.2)
        pb = Params(D=pb.D.astype(jnp.float32), k=pb.k.astype(jnp.float32))
        kw = dict(dr=0.4, tf=2.0, Nts=2, rtol=1e-4, atol=1e-7,
                  method="trbdf2", return_stats=True)
        ref, _ = solve_stiff_batch(system, Co, pb, **kw)
        b16, sb = solve_stiff_batch(system, Co, pb,
                                    linsolve_dtype=jnp.bfloat16, **kw)
        assert not np.asarray(sb.failed).any()
        Cr = np.asarray(ref.C[:, -1], np.float64)
        Cb = np.asarray(b16.C[:, -1], np.float64)
        err = np.max(np.abs(Cb - Cr) / (np.abs(Cr) + 1e-6))
        assert err < 5e-4, err

    def test_f32_linsolve_rosenbrock23(self):
        """The GSA production recipe: f64-state Rosenbrock23 with f32
        linear algebra (bands, factor, stage solves).  A W-method keeps
        its order under a perturbed-but-consistent W̃; the f32
        factorization is W + O(1e-7), far inside the rtol budget.
        Measured on v5e (scripts/probe_gsa_mixed.py): identical step
        counts, p99 output agreement 1e-4, 0 extra failures at the
        x1000-bounds eFAST corners, 7.2x faster than full-f64."""
        system = g.base_system()
        Co = g.default_co()
        pb = _param_batch(6, spread=0.25)
        kw = dict(dr=0.5, tf=2.0, Nts=2, rtol=1e-4, atol=1e-7,
                  method="rosenbrock23", return_stats=True)
        ref, _ = solve_stiff_batch(system, Co, pb, **kw)
        mix, sm = solve_stiff_batch(system, Co, pb,
                                    linsolve_dtype=jnp.float32, **kw)
        assert not np.asarray(sm.failed).any()
        Cr = np.asarray(ref.C[:, -1], np.float64)
        Cm = np.asarray(mix.C[:, -1], np.float64)
        err = np.max(np.abs(Cm - Cr) / (np.abs(Cr) + 1e-6))
        assert err < 5e-4, err

    def test_rodas_order_and_step_advantage(self):
        """The order-3/4 Rosenbrock tableaus (RODAS3/RODAS4) must hit
        the tolerance AND the order-4 method must need materially fewer
        steps than the order-2 ones at the same rtol — that step-count
        gap (steps ~ tol^(-1/(p+1))) is the whole reason the methods
        exist (the reference's QNDF makes the same trade by varying its
        BDF order, define_PDESystem_base.jl:288)."""
        system = g.base_system()
        Co = g.default_co()
        pb = _param_batch(4, spread=0.1)
        kw = dict(dr=0.5, tf=5.0, Nts=2, return_stats=True)
        ref, _ = solve_stiff_batch(system, Co, pb, rtol=1e-10, atol=1e-13,
                                   method="trbdf2", **kw)
        Cr = np.asarray(ref.C[:, -1], np.float64)
        steps = {}
        for m, bound in [("rosenbrock23", 2e-4), ("rodas3", 2e-4),
                         ("rodas4", 5e-5)]:
            sol, st = solve_stiff_batch(system, Co, pb, rtol=1e-4,
                                        atol=1e-7, method=m, **kw)
            assert not np.asarray(st.failed).any()
            C = np.asarray(sol.C[:, -1], np.float64)
            err = np.max(np.abs(C - Cr) / (np.abs(Cr) + 1e-6))
            assert err < bound, (m, err)
            steps[m] = int(np.asarray(st.n_accepted).sum())
        assert steps["rodas4"] < 0.5 * steps["rosenbrock23"], steps

    def test_rodas4_mixed_precision(self):
        """rodas4 with f32 linear algebra (the production recipe) keeps
        its order: the stage solves all share one consistent W-tilde =
        W + O(1e-7), the same argument validated for rosenbrock23
        (test_f32_linsolve_rosenbrock23)."""
        system = g.base_system()
        Co = g.default_co()
        pb = _param_batch(4, spread=0.2)
        kw = dict(dr=0.5, tf=2.0, Nts=2, rtol=1e-6, atol=1e-9,
                  method="rodas4", return_stats=True)
        ref, _ = solve_stiff_batch(system, Co, pb, **kw)
        mix, sm = solve_stiff_batch(system, Co, pb,
                                    linsolve_dtype=jnp.float32, **kw)
        assert not np.asarray(sm.failed).any()
        Cr = np.asarray(ref.C[:, -1], np.float64)
        Cm = np.asarray(mix.C[:, -1], np.float64)
        err = np.max(np.abs(Cm - Cr) / (np.abs(Cr) + 1e-6))
        assert err < 5e-5, err

    def test_rodas4_pulse_chase_and_dense_output(self):
        """Two-leg (kp-event) integration and the lazily-evaluated
        f(y_1) Hermite dense output: rodas4 snapshots on a fine save
        grid must track a tight trbdf2 reference at every save time,
        not just tf."""
        system = g.base_system()
        Co = g.default_co()
        pb = _param_batch(3, spread=0.1)
        kw = dict(dr=0.5, tf=7.0, Nts=14, t_prechase=5.0,
                  return_stats=True)
        ref, _ = solve_stiff_batch(system, Co, pb, rtol=1e-9, atol=1e-12,
                                   method="trbdf2", **kw)
        sol, st = solve_stiff_batch(system, Co, pb, rtol=1e-5, atol=1e-8,
                                    method="rodas4", **kw)
        assert not np.asarray(st.failed).any()
        Cr = np.asarray(ref.C, np.float64)    # (B, Nts+1, 10, Nr+1)
        Cs = np.asarray(sol.C, np.float64)
        err = np.max(np.abs(Cs - Cr) / (np.abs(Cr).max() + 1e-6))
        assert err < 1e-4, err

    def test_fast_jacobian_matches_colored_jvps(self):
        """fast_block_jacobian_lanes (analytic stencil + pointwise
        reaction JVPs + boundary jacfwd) must equal the 38-colored-JVP
        Jacobian to fp roundoff for every system variant."""
        import gab1_shp2_tpu as g2
        from gab1_shp2_tpu.ops import batch_stiff as bs

        rng = np.random.default_rng(0)
        p0 = np.asarray(g2.default_params().pack())
        dr, R, B = 0.5, 10.0, 3
        Nr = int(round(R / dr))
        r = jnp.arange(Nr + 1) * dr
        for system in (g2.base_system(), g2.memb_sfk_system(),
                       g2.rect_system()):
            pb = Params.unpack(jnp.asarray(
                p0[None, :] * np.exp(rng.normal(0, 0.3, (B, 24)))))
            rhs_fn, _ = bs.make_mol_rhs_lanes(system, R, dr)
            y = jnp.asarray(np.abs(rng.normal(2.0, 1.0, (Nr, 10, B))))
            ref = bs.block_jacobian_lanes(lambda yy: rhs_fn(yy, pb), y)
            fast = bs.fast_block_jacobian_lanes(system, y, pb, r, dr)
            for a, b in zip(ref, fast):
                rel = float(jnp.max(jnp.abs(a - b))) / (
                    float(jnp.max(jnp.abs(a))) + 1e-30)
                assert rel < 1e-12, rel


def _final_profile(sol):
    """Per-lane reducer: final-time total GAB1-SHP2 profile."""
    return sol.PG1Stot[-1]


class TestRefillScheduler:
    """Lane-refill continuation batching vs the chunked scheduler.

    The two schedulers share one copy of the step arithmetic
    (ops/batch_stiff._solver_ctx) and all lane ops are elementwise in
    the lane axis, so a member's step/acceptance sequence must match
    EXACTLY whichever scheduler runs it — any step-count drift means a
    cross-lane reduction leaked into lane values.  Values agree to
    float roundoff only (XLA fuses differently-shaped programs with
    different FMA associativity; measured <=6e-13 relative in f64).
    """

    def test_bitwise_matches_chunked(self):
        from gab1_shp2_tpu.ops.batch_stiff import solve_stiff_refill

        system = g.base_system()
        Co = g.default_co()
        N = 10
        pb = _param_batch(N, spread=0.3, seed=5)
        kw = dict(dr=0.5, tf=2.0, Nts=4, rtol=1e-5, atol=1e-8,
                  method="rodas4")
        solb, statb = solve_stiff_batch(system, Co, pb, return_stats=True,
                                        **kw)
        out, ok, steps = solve_stiff_refill(system, Co, pb, lanes=4,
                                            harvest_every=3, **kw)
        np.testing.assert_array_equal(
            np.asarray(steps),
            np.asarray(statb.n_accepted + statb.n_rejected))
        np.testing.assert_allclose(np.asarray(out.C), np.asarray(solb.C),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(out.m), np.asarray(solb.m),
                                   rtol=1e-9, atol=1e-9)
        assert np.asarray(ok).all()

    def test_two_leg_pulse_chase_matches_chunked(self):
        """Per-lane leg switching (VERDICT-r4 item 3): a two-leg
        pulse-chase refill ensemble must be controller-identical to the
        chunked two-leg integrator even though refilled lanes cross
        t_prechase at staggered wall-clock iterations."""
        from gab1_shp2_tpu.ops.batch_stiff import solve_stiff_refill

        system = g.base_system()
        Co = g.default_co()
        N = 9
        pb = _param_batch(N, spread=0.3, seed=11)
        kw = dict(dr=0.5, tf=2.0, Nts=4, rtol=1e-5, atol=1e-8,
                  method="rodas4", t_prechase=1.0)
        solb, statb = solve_stiff_batch(system, Co, pb, return_stats=True,
                                        **kw)
        out, ok, steps = solve_stiff_refill(system, Co, pb, lanes=3,
                                            harvest_every=3, **kw)
        np.testing.assert_array_equal(
            np.asarray(steps),
            np.asarray(statb.n_accepted + statb.n_rejected))
        np.testing.assert_allclose(np.asarray(out.C), np.asarray(solb.C),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(out.m), np.asarray(solb.m),
                                   rtol=1e-9, atol=1e-9)
        assert np.asarray(ok).all()
        # the chase leg actually fired: pEGFR decays after t_prechase
        pE = np.asarray(solb.pE).mean(axis=0)  # (Nts+1,)
        assert pE[-1] < 0.5 * pE[2]  # Nts=4: slot 2 = t_prechase

    def test_reducer_extract_and_small_queue(self):
        """N < lanes (dead lanes from the start) + a reducing extract."""
        from gab1_shp2_tpu.ops.batch_stiff import solve_stiff_refill

        system = g.base_system()
        Co = g.default_co()
        N = 3
        pb = _param_batch(N, spread=0.2, seed=7)
        kw = dict(dr=0.5, tf=1.0, Nts=2, rtol=1e-5, atol=1e-8,
                  method="rodas4")
        solb = solve_stiff_batch(system, Co, pb, **kw)
        out, ok, _ = solve_stiff_refill(system, Co, pb, extract=_final_profile,
                                        lanes=8, harvest_every=4, **kw)
        want = np.asarray(solb.PG1Stot[:, -1])
        np.testing.assert_allclose(np.asarray(out), want,
                                   rtol=1e-9, atol=1e-9)
        assert np.asarray(ok).all()

    def test_failure_masking_and_batched_co(self):
        """A poisoned lane is harvested as failed; its slot is refilled
        and later members still solve; per-lane Co rows flow through."""
        from gab1_shp2_tpu.ops.batch_stiff import solve_stiff_refill

        system = g.base_system()
        Co = np.asarray(g.default_co())
        N = 6
        pb = _param_batch(N, spread=0.0)
        packed = np.array(pb.pack())
        packed[1, 7:] *= 1e12  # blow up one member's kinetics
        pb = Params.unpack(jnp.asarray(packed))
        Cob = jnp.asarray(np.stack([Co * (1.0 - 0.05 * i)
                                    for i in range(N)]))
        kw = dict(dr=1.0, tf=1.0, Nts=2, rtol=1e-5, atol=1e-8,
                  max_steps=2000, method="rodas4")
        solb, statb = solve_stiff_batch(system, Cob, pb, return_stats=True,
                                        **kw)
        out, ok, steps = solve_stiff_refill(system, Cob, pb, lanes=2,
                                            harvest_every=5, **kw)
        okb = ~np.asarray(statb.failed)
        np.testing.assert_array_equal(np.asarray(ok), okb)
        assert not np.asarray(ok)[1]
        good = np.asarray(ok)
        np.testing.assert_allclose(np.asarray(out.C)[good],
                                   np.asarray(solb.C)[good],
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_array_equal(np.asarray(out.CoEGFR),
                                      np.asarray(Cob[:, 4]))
