"""Cross-implementation validation (reference idiom #1, SURVEY.md
section 4): our JAX explicit solver vs an independently written
scalar NumPy transcription of the same scheme, and the stiff path vs
both."""

import numpy as np
import pytest

from gab1_shp2_tpu import base_system, default_co, default_params, solve_explicit
from gab1_shp2_tpu.models.species import CYTO_SPECIES
from tests.reference_numpy_solver import solve_numpy


def test_explicit_matches_independent_numpy():
    co = np.asarray(default_co())
    p = default_params()
    D = np.asarray(p.D)
    k = np.asarray(p.k)
    kw = dict(R=10.0, dr=0.5, tf=0.5, maxiters=100, tol=1e-6)

    ref = solve_numpy(co, D, k, Nts=2, **kw)
    sol = solve_explicit(base_system(), default_co(), p, dr=0.5, tf=0.5,
                         Nts=2, maxiters=100, tol=1e-6)

    for name in CYTO_SPECIES:
        ours = np.asarray(sol.cyto(name)[-1])
        theirs = ref[name]
        np.testing.assert_allclose(
            ours, theirs, rtol=1e-10, atol=1e-12,
            err_msg=f"species {name} diverges from the independent "
                    f"NumPy implementation")
    from gab1_shp2_tpu.models.species import MEMB_SPECIES

    for i, name in enumerate(MEMB_SPECIES):
        np.testing.assert_allclose(float(sol.m[-1, i]), ref[f"m_{name}"],
                                   rtol=1e-10, atol=1e-14, err_msg=name)


def test_numpy_solver_pe_trace_sane():
    co = np.asarray(default_co())
    p = default_params()
    ref = solve_numpy(co, np.asarray(p.D), np.asarray(p.k), dr=0.5,
                      tf=0.5, Nts=2)
    assert ref["pE"][-1] > 0.1  # EGFR phosphorylates under EGF
