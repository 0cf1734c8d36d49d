"""Cross-implementation validation (reference idiom #1, SURVEY.md
section 4): our JAX explicit solver vs an independently written
scalar NumPy transcription of the same scheme, and the stiff path vs
both.  Covers the base spherical scheme AND the variants the reference
cross-validates with its MATLAB twin (rect geometry,
membrane-confined SFKs, gefitinib pulse-chase)."""

import numpy as np
import pytest

from gab1_shp2_tpu import (
    base_system,
    default_co,
    default_params,
    memb_sfk_system,
    rect_system,
    solve_explicit,
)
from gab1_shp2_tpu.models.species import CYTO_SPECIES, MEMB_SPECIES
from tests.reference_numpy_solver import solve_numpy


def _assert_matches(sol, ref):
    for name in CYTO_SPECIES:
        ours = np.asarray(sol.cyto(name)[-1])
        np.testing.assert_allclose(
            ours, ref[name], rtol=1e-10, atol=1e-12,
            err_msg=f"species {name} diverges from the independent "
                    f"NumPy implementation")
    for i, name in enumerate(MEMB_SPECIES):
        np.testing.assert_allclose(float(sol.m[-1, i]), ref[f"m_{name}"],
                                   rtol=1e-10, atol=1e-14, err_msg=name)


def test_explicit_matches_independent_numpy():
    co = np.asarray(default_co())
    p = default_params()
    ref = solve_numpy(co, np.asarray(p.D), np.asarray(p.k), R=10.0,
                      dr=0.5, tf=0.5, maxiters=100, tol=1e-6, Nts=2)
    sol = solve_explicit(base_system(), default_co(), p, dr=0.5, tf=0.5,
                         Nts=2, maxiters=100, tol=1e-6)
    _assert_matches(sol, ref)


def test_rect_matches_independent_numpy():
    """Rectangular geometry vs the oracle's Cartesian-Laplacian branch
    (the role ``MATLAB/basepdesolver_rect.m`` plays for the
    reference)."""
    co = np.asarray(default_co())
    p = default_params()
    ref = solve_numpy(co, np.asarray(p.D), np.asarray(p.k), R=10.0,
                      dr=0.5, tf=0.5, maxiters=100, tol=1e-6, Nts=2,
                      geometry="rect")
    sol = solve_explicit(rect_system(), default_co(), p, dr=0.5, tf=0.5,
                         Nts=2, maxiters=100, tol=1e-6)
    _assert_matches(sol, ref)


def test_memb_sfk_matches_independent_numpy():
    """Membrane-confined SFKs (D_aSFK = 1e-32 in stencil and ghost
    closure, ``basepdesolver.jl:366,530``) vs the oracle."""
    co = np.asarray(default_co())
    p = default_params()
    ref = solve_numpy(co, np.asarray(p.D), np.asarray(p.k), R=10.0,
                      dr=0.5, tf=0.5, maxiters=100, tol=1e-6, Nts=2,
                      memb_sfk=True)
    sol = solve_explicit(memb_sfk_system(), default_co(), p, dr=0.5,
                         tf=0.5, Nts=2, maxiters=100, tol=1e-6)
    _assert_matches(sol, ref)


def test_pulse_chase_matches_independent_numpy():
    """Gefitinib pulse-chase kp-off event, step-quantized identically
    (``pulsechase_solver.jl:156-158``)."""
    co = np.asarray(default_co())
    p = default_params()
    ref = solve_numpy(co, np.asarray(p.D), np.asarray(p.k), R=10.0,
                      dr=0.5, tf=1.0, maxiters=100, tol=1e-6, Nts=2,
                      t_prechase=0.5)
    sol = solve_explicit(base_system(), default_co(), p, dr=0.5, tf=1.0,
                         Nts=2, maxiters=100, tol=1e-6, t_prechase=0.5)
    _assert_matches(sol, ref)


def test_numpy_solver_pe_trace_sane():
    co = np.asarray(default_co())
    p = default_params()
    ref = solve_numpy(co, np.asarray(p.D), np.asarray(p.k), dr=0.5,
                      tf=0.5, Nts=2)
    assert ref["pE"][-1] > 0.1  # EGFR phosphorylates under EGF
