"""Double-f32 (EFT) arithmetic and the compensated RHS (VERDICT-r4
item 6 prototype)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gab1_shp2_tpu as g
from gab1_shp2_tpu.models.params import Params


class TestPrimitives:
    def test_two_sum_exact(self):
        from gab1_shp2_tpu.ops.df32 import two_sum

        rng = np.random.default_rng(0)
        a = (rng.normal(size=1000) * 10.0**rng.integers(-6, 6, 1000)
             ).astype(np.float32)
        b = (rng.normal(size=1000) * 10.0**rng.integers(-6, 6, 1000)
             ).astype(np.float32)
        s, e = two_sum(jnp.asarray(a), jnp.asarray(b))
        # s + e must equal a + b EXACTLY in f64
        got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
        want = a.astype(np.float64) + b.astype(np.float64)
        np.testing.assert_array_equal(got, want)

    def test_two_prod_exact(self):
        from gab1_shp2_tpu.ops.df32 import two_prod

        rng = np.random.default_rng(1)
        a = (rng.normal(size=1000) * 10.0**rng.integers(-4, 4, 1000)
             ).astype(np.float32)
        b = (rng.normal(size=1000) * 10.0**rng.integers(-4, 4, 1000)
             ).astype(np.float32)
        p, e = two_prod(jnp.asarray(a), jnp.asarray(b))
        got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
        want = a.astype(np.float64) * b.astype(np.float64)
        # a*b in f64 is exact (24+24 <= 53 bits)
        np.testing.assert_array_equal(got, want)

    def test_roundtrip_and_ops(self):
        from gab1_shp2_tpu.ops import df32 as d3

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.lognormal(0, 3, 512))
        y = jnp.asarray(rng.lognormal(0, 3, 512))
        xd, yd = d3.from_f64(x), d3.from_f64(y)
        # hi+lo carries ~48 bits: the f64 roundtrip is accurate to
        # ~2^-48, not exact (lo itself rounds the 29-bit residual)
        np.testing.assert_allclose(np.asarray(d3.to_f64(xd)),
                                   np.asarray(x), rtol=1e-14)
        # compare against f64 arithmetic on the df32-REPRESENTED
        # inputs: measures the operations' error alone (the hi+lo
        # representation itself carries ~2^-48 of x, which sub's
        # cancellation would otherwise amplify arbitrarily)
        xr, yr = d3.to_f64(xd), d3.to_f64(yd)
        for name, got, want in [
            ("add", d3.to_f64(xd + yd), xr + yr),
            ("sub", d3.to_f64(xd - yd), xr - yr),
            ("mul", d3.to_f64(xd * yd), xr * yr),
            ("div", d3.to_f64(xd / yd), xr / yr),
        ]:
            rel = np.max(np.abs(np.asarray(got - want))
                         / np.abs(np.asarray(want)))
            assert rel < 1e-13, (name, rel)


class TestDf32RHS:
    def test_matches_f64_rhs(self):
        """The compensated RHS must match the emulated/native f64 RHS
        to ~double-f32 precision on realistic mid-solve states."""
        from gab1_shp2_tpu.ops.batch_stiff import make_mol_rhs_lanes
        from gab1_shp2_tpu.ops.rhs_df32 import make_mol_rhs_lanes_df32
        from gab1_shp2_tpu.ops.batch_stiff import _lanes_y0

        system = g.base_system()
        R, dr, B = 10.0, 0.5, 8
        f64, _ = make_mol_rhs_lanes(system, R, dr)
        fdf, _ = make_mol_rhs_lanes_df32(system, R, dr)

        rng = np.random.default_rng(3)
        Co = np.asarray(g.default_co())
        CoT = jnp.asarray(np.repeat(Co[:, None], B, 1)
                          * rng.lognormal(0, 0.2, (5, B)))
        M = int(round(R / dr)) - 1
        y0 = _lanes_y0(CoT, M, jnp.float64)
        # evolve off the initial state so every species is populated
        p0 = np.asarray(g.default_params().pack())
        pb = Params.unpack(jnp.asarray(
            p0[None, :] * rng.lognormal(0, 0.2, (B, 24))))
        y = y0 + 0.01 * jnp.asarray(
            rng.lognormal(0, 0.5, y0.shape)) * (y0 + 1e-3)

        from gab1_shp2_tpu.ops import df32 as d3

        a = np.asarray(f64(y, pb))
        b = np.asarray(fdf(y, pb))
        denom = np.abs(a) + 1e-30 * np.max(np.abs(a))
        # end-to-end (incl. the ~2^-48 input representation error,
        # amplified by cancellation in net-rate differences)
        assert np.max(np.abs(a - b) / denom) < 1e-7
        # operation error alone: f64 RHS evaluated at the df32-rounded
        # state (and df32-rounded params) vs the compensated RHS
        y_r = d3.to_f64(d3.from_f64(y))
        pb_r = Params(D=d3.to_f64(d3.from_f64(pb.D)),
                      k=d3.to_f64(d3.from_f64(pb.k)))
        a_r = np.asarray(f64(y_r, pb_r))
        rel_op = np.max(np.abs(a_r - b) / denom)
        assert rel_op < 1e-10, rel_op

    def test_jvp_through_df32_rhs(self):
        """Forward-mode tangents (the Jacobian-band route) must flow
        through the compensated RHS."""
        from gab1_shp2_tpu.ops.rhs_df32 import make_mol_rhs_lanes_df32
        from gab1_shp2_tpu.ops.batch_stiff import (_lanes_y0,
                                                   make_mol_rhs_lanes)

        system = g.base_system()
        R, dr, B = 10.0, 1.0, 4
        fdf, _ = make_mol_rhs_lanes_df32(system, R, dr)
        f64, _ = make_mol_rhs_lanes(system, R, dr)
        Co = np.asarray(g.default_co())
        CoT = jnp.asarray(np.repeat(Co[:, None], B, 1))
        y = _lanes_y0(CoT, int(round(R / dr)) - 1, jnp.float64) + 0.1
        p0 = np.asarray(g.default_params().pack())
        pb = Params.unpack(jnp.broadcast_to(jnp.asarray(p0), (B, 24)))
        v = jnp.ones_like(y)
        _, ta = jax.jvp(lambda yy: f64(yy, pb), (y,), (v,))
        _, tb = jax.jvp(lambda yy: fdf(yy, pb), (y,), (v,))
        na = np.asarray(ta)
        nb = np.asarray(tb)
        denom = np.abs(na).max()
        assert np.max(np.abs(na - nb)) / denom < 1e-5


class TestDf32StiffPath:
    def test_solve_stiff_batch_rhs_df32_parity(self):
        """rhs_mixed='df32' on the f64 north-star-shaped config must
        track the native-f64 trajectory at the controller level: the
        compensated RHS agrees to ~2^-48, but a perturbation that small
        can still flip an accept/reject boundary (measured: step counts
        differ by <=1 per lane, solutions by ~4e-6 — different accepted
        step SEQUENCES each satisfying the local tolerance, not an RHS
        bias; the jvp-split scheme's ~1e-7 systematic floor is the
        contrast)."""
        from gab1_shp2_tpu.ops.batch_stiff import solve_stiff_batch

        system = g.base_system()
        Co = jnp.asarray(np.asarray(g.default_co()))
        rng = np.random.default_rng(0)
        B = 4
        p0 = np.asarray(g.default_params().pack())
        pb = Params.unpack(jnp.asarray(p0[None, :]
                                       * rng.lognormal(0, 0.15, (B, 24))))
        kw = dict(R=10.0, dr=1.0, tf=5.0, Nts=2, rtol=1e-6, atol=1e-9,
                  method="rodas4", linsolve_dtype=jnp.float32)
        s0, st0 = solve_stiff_batch(system, Co, pb, return_stats=True,
                                    **kw)
        s1, st1 = solve_stiff_batch(system, Co, pb, return_stats=True,
                                    rhs_mixed="df32", **kw)
        acc0 = np.asarray(st0.n_accepted)
        acc1 = np.asarray(st1.n_accepted)
        assert np.max(np.abs(acc0 - acc1)) <= 2, (acc0, acc1)
        a, b = np.asarray(s0.C), np.asarray(s1.C)
        rel = np.max(np.abs(a - b) / (np.abs(a) + 1e-6 * np.abs(a).max()))
        assert rel < 2e-5, rel

    def test_rhs_df32_requires_f64_state(self):
        from gab1_shp2_tpu.ops.batch_stiff import solve_stiff_batch

        system = g.base_system()
        Co = jnp.asarray(np.asarray(g.default_co()), jnp.float32)
        p0 = np.asarray(g.default_params().pack())
        pb = Params.unpack(jnp.asarray(
            np.repeat(p0[None, :], 2, 0), jnp.float32))
        with pytest.raises(ValueError):
            solve_stiff_batch(system, Co, pb, R=10.0, dr=1.0, tf=1.0,
                              Nts=2, rhs_mixed="df32")
