"""Model-reduction ladder and analytic steady-state checks (reference
idioms #3-4, SURVEY.md section 4; ports of
``MATLAB/finitediff_steady_state_BVP_comparison.m`` and
``MATLAB/ssfindiffsol{4,2,1}.m``).

At t = 5 min the full PDE is near steady state; its profiles must agree
with independently computed steady-state solutions of reduced systems:

  1. the closed-form aSFK profile (amplitude included)
     ``C(r) = alpha sinh(mr)/(mr)`` with the Robin-flux amplitude,
  2. the 4-ODE GAB1/pGAB1/PG1S/SHP2 steady-state BVP with trapz
     mass-balance closures (``ssfindiffsol4.m:48-91``),
  3. the 2-ODE GAB1/SHP2 reduction with algebraic pGAB1 and G1S2
     closures (``ssfindiffsol2.m:53-80``),
  4. the 1-ODE GAB1 reduction with algebraic SHP2 quadratic
     (``ssfindiffsol1.m:52-70``),

each solved independently by scipy least squares on a
finite-difference grid.  The rungs catch different coupling errors:
the 4/2-ODE systems keep the pGAB1<->SHP2 binding kinetics (and agree
with the PDE to <1%), while the 1-ODE rung also equilibrates that
binding (profile-level agreement only).
"""

import numpy as np
import pytest
from scipy.optimize import least_squares

from gab1_shp2_tpu import base_system, default_co, default_params, solve_stiff


R = 10.0


@pytest.fixture(scope="module")
def full_solution():
    co = default_co()
    p = default_params()
    sol = solve_stiff(base_system(), co, p, dr=0.1, tf=5.0, Nts=4,
                      rtol=1e-6, atol=1e-9)
    return sol, co, p


def analytic_asfk(r, CoSFK, CpEtot, D_S, kSa, kSi):
    """Closed-form steady-state aSFK profile with reactive-flux
    amplitude (``finitediff_steady_state_BVP_comparison.m:98-104``)."""
    m = np.sqrt(kSi / D_S)
    alpha = (kSa * CoSFK * CpEtot / D_S
             / (np.cosh(m * R) / R
                + np.sinh(m * R) * (-1.0 / (m * R**2)
                                    + kSa * CpEtot / (m * D_S * R))))
    out = np.full_like(r, alpha)
    nz = r > 0
    out[nz] = alpha * np.sinh(m * r[nz]) / (m * r[nz])
    return out


class TestAnalyticSFK:
    def test_amplitude_and_shape(self, full_solution):
        sol, co, p = full_solution
        r = np.asarray(sol.r)
        asfk_pde = np.asarray(sol.cyto("aSFK")[-1])
        cpe = float(sol.pE[-1]) / 100.0 * float(co[4])
        asfk_an = analytic_asfk(r, float(co[0]), cpe, float(p.Dsfk),
                                float(p.kSa), float(p.kSi))
        # t=5 min is close to (not exactly at) steady state; the
        # reference's own overlay shows the same few-percent residual
        np.testing.assert_allclose(asfk_pde, asfk_an, rtol=0.05)


def _pde_lumped_profiles(sol, r):
    """The full-PDE lumped profiles the MATLAB comparison overlays
    (``finitediff_steady_state_BVP_comparison.m:91-97`` plotC),
    interpolated onto the reduction grid."""
    r_pde = np.asarray(sol.r)
    return dict(
        gab1=np.interp(r, r_pde, np.asarray(sol.cyto("GAB1")[-1]
                                            + sol.cyto("G2G1")[-1])),
        pg1tot=np.interp(r, r_pde, np.asarray(sol.PG1tot[-1])),
        pg1s=np.interp(r, r_pde, np.asarray(sol.PG1Stot[-1])),
        shp2=np.interp(r, r_pde, np.asarray(sol.cyto("SHP2")[-1])),
    )


class TestFourODEReduction:
    def test_profiles_match_full_pde(self, full_solution):
        """The 4-ODE GAB1/pGAB1/PG1S/SHP2 steady-state BVP
        (``ssfindiffsol4.m:48-91``): central-difference interior
        residuals, Neumann closures at both ends, and trapz mass
        balances for total GAB1 and SHP2, with the analytic aSFK
        profile as input.  Keeps the SHP2-binding kinetics the 1-ODE
        rung equilibrates away, so agreement with the full PDE is
        sub-percent."""
        sol, co, p = full_solution
        CoG1, CoS2, CoSFK = float(co[2]), float(co[3]), float(co[0])
        kS2f, kS2r = float(p.kS2f), float(p.kS2r)
        kG1p, kG1dp = float(p.kG1p), float(p.kG1dp)
        D_G1, D_G1S2, D_S2 = float(p.Dg1), float(p.Dg1s2), float(p.Ds2)
        cpe = float(sol.pE[-1]) / 100.0 * float(co[4])

        n = 100
        h = R / n
        r = np.linspace(0, R, n + 1)
        casfk = analytic_asfk(r, CoSFK, cpe, float(p.Dsfk), float(p.kSa),
                              float(p.kSi))
        i = np.arange(1, n)

        def lap(C, D):
            return D * ((C[i + 1] - C[i - 1]) / (r[i] * h)
                        + (C[i + 1] - 2 * C[i] + C[i - 1]) / h**2)

        def species_resid(C, D, react):
            return np.concatenate(
                [[C[1] - C[0]], lap(C, D) + react, [C[n] - C[n - 1]]])

        def resid(x):
            G, PG, PS, S2 = x.reshape(4, n + 1)
            Fg = species_resid(G, D_G1,
                               kG1dp * PG[i] - kG1p * G[i] * casfk[i])
            Fp = species_resid(PG, D_G1,
                               -kG1dp * PG[i] + kG1p * G[i] * casfk[i])
            Fs = species_resid(PS, D_G1S2,
                               -kS2r * PS[i] + kS2f * PG[i] * S2[i])
            F2 = species_resid(S2, D_S2,
                               kS2r * PS[i] - kS2f * PG[i] * S2[i])
            g1tot, s2tot = G + PG + PS, PS + S2
            mb1 = 3.0 / R**3 * np.trapezoid(g1tot * r**2, r) - CoG1
            mb2 = 3.0 / R**3 * np.trapezoid(s2tot * r**2, r) - CoS2
            return np.concatenate([Fg, Fp, Fs, F2, [mb1, mb2]])

        res = least_squares(resid, np.full(4 * (n + 1), 75.0),
                            method="trf", xtol=1e-14, ftol=1e-14,
                            gtol=1e-14)
        G, PG, PS, S2 = res.x.reshape(4, n + 1)
        assert res.cost < 1e-10  # the BVP itself is solved exactly

        full = _pde_lumped_profiles(sol, r)
        np.testing.assert_allclose(G, full["gab1"], rtol=0.05)
        np.testing.assert_allclose(PG + PS, full["pg1tot"], rtol=0.05)
        np.testing.assert_allclose(PS, full["pg1s"], rtol=0.05)
        np.testing.assert_allclose(S2, full["shp2"], rtol=0.05)


class TestTwoODEReduction:
    def test_profiles_match_full_pde(self, full_solution):
        """The 2-ODE GAB1/SHP2 reduction (``ssfindiffsol2.m:53-80``)
        with algebraic closures pGAB1 = CoG1 - GAB1 - CoS2 + SHP2 and
        G1S2 = CoS2 - SHP2."""
        sol, co, p = full_solution
        CoG1, CoS2, CoSFK = float(co[2]), float(co[3]), float(co[0])
        kS2f, kS2r = float(p.kS2f), float(p.kS2r)
        kG1p, kG1dp = float(p.kG1p), float(p.kG1dp)
        D_G1, D_S2 = float(p.Dg1), float(p.Ds2)
        cpe = float(sol.pE[-1]) / 100.0 * float(co[4])

        n = 100
        h = R / n
        r = np.linspace(0, R, n + 1)
        casfk = analytic_asfk(r, CoSFK, cpe, float(p.Dsfk), float(p.kSa),
                              float(p.kSi))
        i = np.arange(1, n)

        def lap(C, D):
            return D * ((C[i + 1] - C[i - 1]) / (r[i] * h)
                        + (C[i + 1] - 2 * C[i] + C[i - 1]) / h**2)

        def resid(x):
            G, S2 = x.reshape(2, n + 1)
            pG = CoG1 - G - CoS2 + S2
            Fg = np.concatenate(
                [[G[1] - G[0]],
                 lap(G, D_G1) + kG1dp * pG[i] - kG1p * G[i] * casfk[i],
                 [G[n] - G[n - 1]]])
            F2 = np.concatenate(
                [[S2[1] - S2[0]],
                 lap(S2, D_S2) + kS2r * (CoS2 - S2[i])
                 - kS2f * S2[i] * pG[i],
                 [S2[n] - S2[n - 1]]])
            g1s2 = CoS2 - S2
            g1tot = G + pG + g1s2
            s2tot = S2 + g1s2
            mb1 = 3.0 / R**3 * np.trapezoid(g1tot * r**2, r) - CoG1
            mb2 = 3.0 / R**3 * np.trapezoid(s2tot * r**2, r) - CoS2
            return np.concatenate([Fg, F2, [mb1, mb2]])

        res = least_squares(resid, np.full(2 * (n + 1), 75.0),
                            method="trf", xtol=1e-14, ftol=1e-14,
                            gtol=1e-14)
        G, S2 = res.x.reshape(2, n + 1)
        PS = CoS2 - S2
        PGtot = CoG1 - G - CoS2 + S2 + PS

        full = _pde_lumped_profiles(sol, r)
        np.testing.assert_allclose(G, full["gab1"], rtol=0.05)
        np.testing.assert_allclose(PGtot, full["pg1tot"], rtol=0.05)
        np.testing.assert_allclose(PS, full["pg1s"], rtol=0.05)
        np.testing.assert_allclose(S2, full["shp2"], rtol=0.05)


class TestOneODEReduction:
    def test_gab1_shp2_profiles(self, full_solution):
        """The single-GAB1-ODE reduction with algebraic SHP2
        (``ssfindiffsol1.m:52-70``), solved independently with scipy
        least squares, must agree with the full PDE's lumped profiles."""
        sol, co, p = full_solution
        CoG1, CoS2, CoSFK = float(co[2]), float(co[3]), float(co[0])
        kS2f, kS2r = float(p.kS2f), float(p.kS2r)
        kG1p, kG1dp = float(p.kG1p), float(p.kG1dp)
        D_G1 = float(p.Dg1)
        cpe = float(sol.pE[-1]) / 100.0 * float(co[4])

        n = 100
        h = R / n
        r = np.linspace(0, R, n + 1)
        casfk = analytic_asfk(r, CoSFK, cpe, float(p.Dsfk), float(p.kSa),
                              float(p.kSi))
        Kr = kS2r / kS2f

        def shp2_of_gab1(G):
            lam = CoG1 - G - CoS2 + Kr
            return (-lam + np.sqrt(lam**2 + 4 * Kr * CoS2)) / 2.0

        def resid(G):
            F = np.empty(n + 3)
            F[0] = G[1] - G[0]
            S2 = shp2_of_gab1(G)
            pG1 = CoG1 - G - (CoS2 - S2)
            i = np.arange(1, n)
            F[1:n] = (D_G1 * ((G[i + 1] - G[i - 1]) / (r[i] * h)
                              + (G[i + 1] - 2 * G[i] + G[i - 1]) / h**2)
                      + kG1dp * pG1[i] - kG1p * G[i] * casfk[i])
            F[n] = G[n] - G[n - 1]
            g1tot = pG1 + (CoS2 - S2) + G
            s2tot = CoS2  # algebraic closure conserves SHP2 exactly
            F[n + 1] = 3.0 / R**3 * np.trapezoid(g1tot * r**2, r) - CoG1
            F[n + 2] = 0.0
            return F

        res = least_squares(resid, np.full(n + 1, CoG1 * 0.5),
                            method="trf", xtol=1e-12, ftol=1e-12)
        G = res.x
        S2 = shp2_of_gab1(G)
        PG1S = CoS2 - S2
        pG1 = CoG1 - G - PG1S

        r_pde = np.asarray(sol.r)
        # full-PDE lumped profiles at tf (the MATLAB comparison's plotC)
        gab1_full = np.interp(r, r_pde,
                              np.asarray(sol.cyto("GAB1")[-1]
                                         + sol.cyto("G2G1")[-1]))
        pg1s_full = np.interp(r, r_pde, np.asarray(sol.PG1Stot[-1]))
        shp2_full = np.interp(r, r_pde, np.asarray(sol.cyto("SHP2")[-1]))

        # the reduction neglects GRB2/EGFR sequestration: agreement is
        # profile-level, not exact (the reference overlays visually)
        np.testing.assert_allclose(G, gab1_full, rtol=0.2)
        np.testing.assert_allclose(PG1S, pg1s_full, rtol=0.25)
        np.testing.assert_allclose(S2, shp2_full, rtol=0.2)
        # and the spatial mean of PG1S agrees within ~15%
        mean_red = 3.0 / R**3 * np.trapezoid(PG1S * r**2, r)
        mean_pde = 3.0 / R**3 * np.trapezoid(pg1s_full * r**2, r)
        assert mean_red == pytest.approx(mean_pde, rel=0.15)
