"""Order and stability regression tests for the ROW (Rosenbrock) tableaus.

The RODAS3/RODAS4 coefficient tables in ``ops/trbdf2._ROW_TABLEAUS``
are 16-digit literals; a single mistyped coefficient typically leaves
the method *consistent* (order >= 1, so tolerance-level PDE tests can
still pass at small cost) while silently destroying the design order or
the L-stability that the adaptive controller's step-size exponent and
the stiff PDE path rely on.  These tests pin both properties the way
they were verified when the tableaus were added (fixed-step convergence
slopes + |R(-1e6)|, see the tableau comment block in ``ops/trbdf2.py``):

* global fixed-step convergence order on the Van der Pol oscillator
  (mu=2), integrated through ``_row_step`` with the production
  cyclic-reduction factor/solve path (NB=1 degenerate block system);
* one-step embedded-estimator order (est ~ h^(est_order+1));
* L-stability: |R(h*lambda)| << 1 for h*lambda -> -inf on y' = lambda*y.

Reference solution via scipy Radau at rtol 1e-12 (independent stack).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from gab1_shp2_tpu.ops.cyclic_reduction import cr_factor, cr_solve
from gab1_shp2_tpu.ops.trbdf2 import _ROW_TABLEAUS, _row_step

MU = 2.0
T = 2.0
Y0 = (2.0, 0.0)


def _f(y):
    # y has the integrator's (NB, n) block shape with NB=1, n=2
    x, v = y[0, 0], y[0, 1]
    return jnp.array([[v, MU * (1.0 - x**2) * v - x]])


_jac = jax.jacfwd(lambda z: _f(z[None])[0])


def _one_step(method, y, h):
    tab = _ROW_TABLEAUS[method]
    eye = jnp.eye(2, dtype=jnp.float64)[None]
    f_n = _f(y)
    Dj = _jac(y[0])[None]
    Z = jnp.zeros_like(Dj)
    return _row_step(tab, cr_factor, cr_solve, _f, y, f_n, (h, h),
                     Z, Dj, Z, eye, jnp.float64)


@partial(jax.jit, static_argnames=("method", "n_steps"))
def _integrate(method, n_steps):
    h = T / n_steps

    def body(y, _):
        y1, _ = _one_step(method, y, h)
        return y1, None

    y0 = jnp.array([list(Y0)], dtype=jnp.float64)
    yT, _ = jax.lax.scan(body, y0, None, length=n_steps)
    return yT


@pytest.fixture(scope="module")
def radau_ref():
    sol = solve_ivp(
        lambda t, y: [y[1], MU * (1.0 - y[0] ** 2) * y[1] - y[0]],
        (0.0, T), list(Y0), method="Radau", rtol=1e-12, atol=1e-12)
    assert sol.success
    return sol.y[:, -1]


@pytest.mark.parametrize("method,order", [("rodas3", 3), ("rodas4", 4)])
def test_global_convergence_order(method, order, radau_ref):
    ns = [40, 80, 160, 320]
    errs = []
    for n in ns:
        yT = np.asarray(_integrate(method, n))[0]
        errs.append(np.linalg.norm(yT - radau_ref))
    hs = [T / n for n in ns]
    slope = -np.polyfit(np.log(ns), np.log(errs), 1)[0]
    # also require the finest grid to actually be accurate
    assert errs[-1] < 1e-5, (method, errs)
    assert order - 0.5 < slope < order + 0.9, (method, slope, errs, hs)


@pytest.mark.parametrize("method", ["rodas3", "rodas4"])
def test_embedded_estimator_order(method):
    est_order = _ROW_TABLEAUS[method]["est_order"]
    y0 = jnp.array([list(Y0)], dtype=jnp.float64)
    hs = [0.02, 0.01, 0.005]
    mags = []
    for h in hs:
        _, est = _one_step(method, y0, jnp.float64(h))
        mags.append(float(jnp.linalg.norm(est)))
    slope = np.polyfit(np.log(hs), np.log(mags), 1)[0]
    # one-step embedded difference ~ h^(est_order+1)
    assert est_order + 1 - 0.6 < slope < est_order + 1 + 0.9, (method, slope)


@pytest.mark.parametrize("method", ["rodas3", "rodas4"])
def test_l_stability(method):
    lam = -1e6
    eye = jnp.eye(1, dtype=jnp.float64)[None]

    def f(y):
        return lam * y

    y0 = jnp.array([[1.0]], dtype=jnp.float64)
    Dj = jnp.array([[[lam]]], dtype=jnp.float64)
    Z = jnp.zeros_like(Dj)
    y1, _ = _row_step(_ROW_TABLEAUS[method], cr_factor, cr_solve, f, y0,
                      f(y0), (1.0, 1.0), Z, Dj, Z, eye, jnp.float64)
    # R(z) -> 0 as z -> -inf for an L-stable method
    assert abs(float(y1[0, 0])) < 1e-3, float(y1[0, 0])
    # and the step must be stable (not amplifying) at moderate stiffness
    Dj2 = jnp.array([[[-5.0]]], dtype=jnp.float64)
    y2, _ = _row_step(_ROW_TABLEAUS[method], cr_factor, cr_solve, f2 := (
        lambda y: -5.0 * y), y0, f2(y0), (1.0, 1.0), Z, Dj2, Z, eye,
        jnp.float64)
    assert abs(float(y2[0, 0])) <= 1.0
