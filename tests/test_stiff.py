"""Stiff TRBDF2 path: linear-algebra kernels, Jacobian structure, and
explicit-vs-implicit cross-validation (the reference's own verification
idiom, ``define_PDESystem_base.jl:268-288`` vs ``basepdesolver.jl``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gab1_shp2_tpu import (
    base_system,
    default_co,
    default_params,
    solve_explicit,
    solve_stiff,
)
from gab1_shp2_tpu.models.params import Params
from gab1_shp2_tpu.ops.blocktridiag import bt_factor, bt_matvec, bt_solve
from gab1_shp2_tpu.ops.jacobian import (
    block_jacobian,
    blocks_to_state,
    state_to_blocks,
)
from gab1_shp2_tpu.ops.rhs import MolState, initial_state, make_mol_rhs
from gab1_shp2_tpu.ops.trbdf2 import _rhs_blocks_fn


class TestBlockTridiag:
    def test_factor_solve_roundtrip(self):
        rng = np.random.default_rng(0)
        NB, n = 12, 10
        D = jnp.asarray(rng.normal(size=(NB, n, n)) + 5 * np.eye(n))
        L = jnp.asarray(0.3 * rng.normal(size=(NB, n, n)))
        U = jnp.asarray(0.3 * rng.normal(size=(NB, n, n)))
        b = jnp.asarray(rng.normal(size=(NB, n)))
        x = bt_solve(bt_factor(L, D, U), b)
        np.testing.assert_allclose(np.asarray(bt_matvec(L.at[0].set(0), D, U, x)),
                                   np.asarray(b), rtol=1e-9, atol=1e-9)

    def test_vmapped_solve(self):
        rng = np.random.default_rng(1)
        B, NB, n = 4, 6, 10
        D = jnp.asarray(rng.normal(size=(B, NB, n, n)) + 6 * np.eye(n))
        L = jnp.asarray(0.2 * rng.normal(size=(B, NB, n, n)))
        U = jnp.asarray(0.2 * rng.normal(size=(B, NB, n, n)))
        b = jnp.asarray(rng.normal(size=(B, NB, n)))
        x = jax.vmap(lambda l, d, u, bb: bt_solve(bt_factor(l, d, u), bb))(
            L, D, U, b)
        for i in range(B):
            xi = bt_solve(bt_factor(L[i], D[i], U[i]), b[i])
            np.testing.assert_allclose(np.asarray(x[i]), np.asarray(xi),
                                       rtol=1e-10, atol=1e-12)


class TestJacobian:
    def test_matches_dense_jacfwd(self):
        """The 38-color structured Jacobian must equal the dense one."""
        R, dr = 10.0, 1.0  # small grid: Nr=10, M=9, NB=10
        sys_ = base_system()
        p = default_params()
        f_blocks, _ = _rhs_blocks_fn(sys_, R, dr)
        y0 = initial_state(default_co(), int(round(R / dr)))
        y = state_to_blocks(y0.C_int, y0.m)
        # perturb off the trivial IC so all couplings are active
        rng = np.random.default_rng(2)
        y = y * (1 + 0.3 * jnp.asarray(rng.uniform(size=y.shape)))

        f = lambda yy: f_blocks(yy, params=p)
        Lb, Db, Ub = block_jacobian(f, y)
        NB, n = y.shape
        J = jax.jacfwd(f)(y).reshape(NB * n, NB * n)
        Jdense = np.asarray(J).reshape(NB, n, NB, n)
        for i in range(NB):
            np.testing.assert_allclose(np.asarray(Db[i]), Jdense[i, :, i, :],
                                       rtol=1e-12, atol=1e-12)
            if i > 0:
                np.testing.assert_allclose(np.asarray(Lb[i]),
                                           Jdense[i, :, i - 1, :],
                                           rtol=1e-12, atol=1e-12)
            if i < NB - 1:
                np.testing.assert_allclose(np.asarray(Ub[i]),
                                           Jdense[i, :, i + 1, :],
                                           rtol=1e-12, atol=1e-12)
        # and nothing outside the three diagonals
        for i in range(NB):
            for j in range(NB):
                if abs(i - j) > 1:
                    np.testing.assert_allclose(Jdense[i, :, j, :], 0.0,
                                               atol=1e-14)


class TestStiffSolve:
    def test_matches_explicit(self):
        """Tolerance-level agreement between the two independent
        numerical routes (reference idiom #2, SURVEY.md section 4)."""
        sys_ = base_system()
        co = default_co()
        p = default_params()
        st = solve_stiff(sys_, co, p, dr=0.2, tf=5.0, Nts=10, rtol=1e-6,
                         atol=1e-9)
        ex = solve_explicit(sys_, co, p, dr=0.2, tf=5.0, Nts=10, tol=1e-6,
                            maxiters=100)
        Cs, Ce = np.asarray(st.C[-1]), np.asarray(ex.C[-1])
        np.testing.assert_allclose(Cs, Ce, rtol=2e-3, atol=1e-6)
        ms, me = np.asarray(st.m[-1]), np.asarray(ex.m[-1])
        np.testing.assert_allclose(ms, me, rtol=2e-3, atol=1e-8)

    def test_tolerance_convergence(self):
        """Halving rtol must reduce the defect vs a tight reference."""
        sys_ = base_system()
        co = default_co()
        p = default_params()
        kw = dict(dr=0.4, tf=2.0, Nts=4)
        tight = np.asarray(solve_stiff(sys_, co, p, rtol=1e-9, atol=1e-12,
                                       **kw).C[-1])

        def err(rtol):
            c = np.asarray(solve_stiff(sys_, co, p, rtol=rtol,
                                       atol=rtol * 1e-3, **kw).C[-1])
            return np.max(np.abs(c - tight) / (np.abs(tight) + 1e-8))

        e4, e6 = err(1e-4), err(1e-6)
        assert e6 < e4
        assert e6 < 1e-4

    def test_stats_and_failure_flag(self):
        sys_ = base_system()
        co = default_co()
        p = default_params()
        sol, stats = solve_stiff(sys_, co, p, dr=0.4, tf=1.0, Nts=4,
                                 rtol=1e-5, atol=1e-8, return_stats=True)
        assert not bool(stats.failed)
        assert int(stats.n_accepted) > 0
        assert np.isfinite(np.asarray(sol.C)).all()
        # absurd step cap -> failure flag + NaN snapshots, no exception
        sol2, stats2 = solve_stiff(sys_, co, p, dr=0.4, tf=1.0, Nts=4,
                                   rtol=1e-8, atol=1e-12, max_steps=3,
                                   return_stats=True)
        assert bool(stats2.failed)
        assert np.isnan(np.asarray(sol2.C[-1])).all()

    def test_pulse_chase_two_legs(self):
        sys_ = base_system()
        co = default_co()
        p = default_params()
        sol = solve_stiff(sys_, co, p, dr=0.4, tf=7.0, Nts=70, rtol=1e-5,
                          atol=1e-8, t_prechase=5.0)
        pe = np.asarray(sol.pE)
        t = np.asarray(sol.t)
        i5 = int(np.argmin(np.abs(t - 5.0)))
        assert pe[i5] > 1.0
        assert pe[-1] < 0.2 * pe[i5]

    def test_vmap_ensemble_rows(self, reference_dir):
        from gab1_shp2_tpu.models.params import load_ensemble_csv

        ens = load_ensemble_csv(
            f"{reference_dir}/Julia/parameter_ensemble.csv")[:8]
        pb = Params.unpack(jnp.asarray(ens))
        sys_ = base_system()
        co = default_co()
        sol, stats = jax.vmap(
            lambda pp: solve_stiff(sys_, co, pp, dr=0.4, tf=5.0, Nts=4,
                                   rtol=1e-4, atol=1e-7, return_stats=True)
        )(pb)
        assert int(stats.failed.sum()) == 0
        assert np.isfinite(np.asarray(sol.C)).all()
        # cross-check one member against a single solve
        one = solve_stiff(sys_, co, Params.unpack(jnp.asarray(ens[3])),
                          dr=0.4, tf=5.0, Nts=4, rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(np.asarray(sol.C[3]), np.asarray(one.C),
                                   rtol=1e-10, atol=1e-12)


class TestMixedPrecision:
    def test_mixed_matches_full_f64(self):
        """f32 factorization under f64 state must not change accuracy
        or step counts (the W-solve is a preconditioner)."""
        import jax.numpy as jnp

        sys_ = base_system()
        co = default_co()
        p = default_params()
        kw = dict(dr=0.4, tf=2.0, Nts=2, rtol=1e-5, atol=1e-8)
        full, st_f = solve_stiff(sys_, co, p, return_stats=True, **kw)
        mixed, st_m = solve_stiff(sys_, co, p, return_stats=True,
                                  linsolve_dtype=jnp.float32, **kw)
        np.testing.assert_allclose(np.asarray(mixed.C[-1]),
                                   np.asarray(full.C[-1]), rtol=1e-5)
        assert abs(int(st_m.n_accepted) - int(st_f.n_accepted)) <= 2
        assert not bool(st_m.failed)


class TestRodasSinglePath:
    def test_rodas4_matches_trbdf2_and_ad(self):
        """The single-lane ROW branch (shared _row_step with the batch
        engine): rodas4 must hit tolerance with materially fewer steps
        than trbdf2 at the same rtol, and forward-mode AD through the
        solve (the fitting path, param_fitting+inference_finitediff
        .jl:238) must agree with finite differences."""
        import jax
        import jax.numpy as jnp

        sys_ = base_system()
        co = default_co()
        p = default_params()
        kw = dict(dr=0.5, tf=5.0, Nts=4)
        ref = solve_stiff(sys_, co, p, rtol=1e-8, atol=1e-11, **kw)
        Cr = np.asarray(ref.C)
        sol_t, st_t = solve_stiff(sys_, co, p, rtol=1e-5, atol=1e-8,
                                  return_stats=True, **kw)
        sol_r, st_r = solve_stiff(sys_, co, p, rtol=1e-5, atol=1e-8,
                                  method="rodas4", return_stats=True, **kw)
        assert not bool(st_r.failed)
        err = np.max(np.abs(np.asarray(sol_r.C) - Cr) / (np.abs(Cr) + 1e-6))
        assert err < 5e-5, err
        assert int(st_r.n_accepted) < 0.7 * int(st_t.n_accepted), (
            int(st_r.n_accepted), int(st_t.n_accepted))

        def obs(logk):
            p2 = default_params().replace(kG1f=jnp.exp(logk))
            s = solve_stiff(sys_, co, p2, dr=1.0, tf=2.0, Nts=2,
                            rtol=1e-4, atol=1e-7, method="rodas4")
            return jnp.sum(s.C[-1])

        x = jnp.log(jnp.asarray(0.5))
        grad = float(jax.jacfwd(obs)(x))
        eps = 1e-4
        fd = float((obs(x + eps) - obs(x - eps)) / (2 * eps))
        assert abs(grad - fd) < 1e-4 * max(1.0, abs(fd)), (grad, fd)
