"""Parameter containers and baseline values.

``Params`` is a JAX pytree holding the 7 cytosolic diffusivities and the
17 kinetic parameters in the reference ordering
(``Julia/basepdesolver.jl:43-68``).  Initial concentrations ``Co`` are a
separate 5-vector (``Julia/basepdesolver.jl:79``).

Baseline values reproduce the reference drivers' ``pvals``
(``Julia/get_param_posteriors.jl:23-34``): prior modes for un-inferred
parameters and either the posterior log-median (default, what the
analysis drivers use) or the MAP fit (``Julia/fitted_parameters.csv``)
for the four fitted parameters ``kG1p, kG1dp, kSa, kSi``.  The numeric
prior-mode values below are exp(mean(log .)) over the reference's shipped
5000-member ``Julia/parameter_ensemble.csv`` (statistical error < 1%),
with entries that correspond to exact literature constants snapped to
those constants (kS2r = kG2r = 480, kdf = 1.2, EGF = 1.67e-3;
``Julia/get_param_priors.jl:14,25,35,117``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gab1_shp2_tpu.models.species import CO_NAMES, DIFF_NAMES, K_NAMES, PNAMES


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Params:
    """Model parameters: diffusivities ``D`` (7,) and kinetics ``k`` (17,).

    Leaves may carry a leading batch dimension (ensemble axis); all solver
    entry points are written to be ``vmap``-ed over such batches.
    """

    D: jax.Array  # (..., 7) um^2/min, order = DIFF_NAMES
    k: jax.Array  # (..., 17), order = K_NAMES

    # --- named accessors -------------------------------------------------
    def __getattr__(self, name: str):
        if name in _DIFF_IDX:
            return self.D[..., _DIFF_IDX[name]]
        if name in _K_IDX:
            return self.k[..., _K_IDX[name]]
        raise AttributeError(name)

    # --- packing (reference 24-vector ordering, get_param_posteriors.jl:24) --
    def pack(self) -> jax.Array:
        """Concatenate to the reference's 24-parameter vector [D; k]."""
        return jnp.concatenate([self.D, self.k], axis=-1)

    @classmethod
    def unpack(cls, p: jax.Array) -> "Params":
        """Build from a packed (..., 24) vector in reference ordering."""
        return cls(D=p[..., :7], k=p[..., 7:24])

    def replace(self, **kv) -> "Params":
        """Return a copy with named parameters replaced (e.g. kG1p=...)."""
        D, k = self.D, self.k
        for name, val in kv.items():
            if name in _DIFF_IDX:
                D = D.at[..., _DIFF_IDX[name]].set(val)
            elif name in _K_IDX:
                k = k.at[..., _K_IDX[name]].set(val)
            else:
                raise KeyError(name)
        return Params(D=D, k=k)

    def scale(self, **kv) -> "Params":
        """Return a copy with named parameters multiplied by factors."""
        D, k = self.D, self.k
        for name, fac in kv.items():
            if name in _DIFF_IDX:
                D = D.at[..., _DIFF_IDX[name]].multiply(fac)
            elif name in _K_IDX:
                k = k.at[..., _K_IDX[name]].multiply(fac)
            else:
                raise KeyError(name)
        return Params(D=D, k=k)


_DIFF_IDX = {n: i for i, n in enumerate(DIFF_NAMES)}
_K_IDX = {n: i for i, n in enumerate(K_NAMES)}


# ---------------------------------------------------------------------------
# Baseline numeric values
# ---------------------------------------------------------------------------

# Prior modes (exp(mu) of the lognormal priors), computed by the ported
# Tsigkinopoulou-protocol pipeline (``gab1_shp2_tpu.priors``, port of
# ``get_param_priors.jl:274-301``); cross-checked against exp(mean(log .))
# over the reference's shipped parameter_ensemble.csv (agreement 0.1-1.3%,
# within that estimator's Monte-Carlo error).  Regenerate with
# ``build_priors().baseline_pvals()``; kept literal here so the core
# model layer has no SciPy dependency at import.
PRIOR_MODES = {
    "Dsfk": 83.90492356885275, "Dg2": 135.82021008988147,
    "Dg2g1": 61.92754655708403, "Dg2g1s2": 55.91981540712498,
    "Dg1": 66.88091525801038, "Dg1s2": 56.921216271953114,
    "Ds2": 79.90018711022756,
    "kS2f": 1.594154765858519, "kS2r": 480.0,
    "kG1f": 0.0008841935962501533, "kG1r": 0.12270919368275156,
    "kG2f": 1.594154765858519, "kG2r": 480.0,
    "kG1p": 0.42, "kG1dp": 9.5, "kSa": 0.42, "kSi": 9.5,
    "kp": 13.84209947593684, "kdp": 41.21160714153434,
    "kEGFf": 55.84051666722567, "kEGFr": 0.13007953061289362,
    "EGF": 1.67e-3, "kdf": 1.2, "kdr": 0.456,
}

# Posterior log-medians of the four fitted parameters
# (Julia/Turing results/Turing_res_5-chains_1000-spls_posteriors_quantiles.csv,
# 50% column) — what the reference analysis drivers use as "best_pvals"
# (Julia/get_param_posteriors.jl:17-31).
POSTERIOR_MEDIAN_FIT = {
    "kG1p": 1.2665193312817182,
    "kG1dp": 3.1179166468335158,
    "kSa": 0.7924254367778611,
    "kSi": 4.665684502848428,
}

# MAP fit (Julia/fitted_parameters.csv) — produced by the TikTak+LBFGS
# optimization in Julia/param_fitting+inference_finitediff.jl:254-270.
MAP_FIT = {
    "kG1p": 41.999999999999964,
    "kG1dp": 0.09499999999999997,
    "kSa": 16.175675458812922,
    "kSi": 0.09499999999999997,
}

FITTED_PARAM_NAMES = ("kG1p", "kG1dp", "kSa", "kSi")

# The single experimental fit datum: % SHP2-bound GAB1 at 5 min EGF
# (Julia/exptl_pct_SHP2-bound-GAB1.csv).
EXPTL_PCT_SHP2_BOUND_GAB1 = (26.426, 9.363293460636593)  # (mu, sigma)


def default_params(fit: str = "posterior_median", dtype=jnp.float64) -> Params:
    """Baseline parameters.

    ``fit`` selects the values of the four fitted parameters:
      * ``"posterior_median"`` — reference drivers' baseline
        (``get_param_posteriors.jl:30-34``).
      * ``"map"`` — the MAP fit (``fitted_parameters.csv``); this is the
        parameter set under which the model reproduces the 26.4%
        SHP2-bound-GAB1 fit datum.
      * ``"prior"`` — pure prior modes.
    """
    vals = dict(PRIOR_MODES)
    if fit == "posterior_median":
        vals.update(POSTERIOR_MEDIAN_FIT)
    elif fit == "map":
        vals.update(MAP_FIT)
    elif fit != "prior":
        raise ValueError(f"unknown fit mode {fit!r}")
    D = jnp.array([vals[n] for n in DIFF_NAMES], dtype=dtype)
    k = jnp.array([vals[n] for n in K_NAMES], dtype=dtype)
    return Params(D=D, k=k)


# ---------------------------------------------------------------------------
# Initial concentrations
# ---------------------------------------------------------------------------

def co_from_copies(
    n_sfk: float, n_grb2: float, n_gab1: float, n_shp2: float, n_egfr: float,
    R: float = 10.0, dtype=jnp.float64,
) -> jax.Array:
    """Convert copies/cell to concentrations for a spherical cell of radius R.

    Cytosolic species -> molecules/um^3 (divide by cell volume), EGFR ->
    molecules/um^2 (divide by surface area); mirrors
    ``Julia/run_base_model.jl:67-76``.
    """
    vol_cf = 1.0 / (4.0 / 3.0 * math.pi * R**3)
    surf_cf = 1.0 / (4.0 * math.pi * R**2)
    return jnp.array(
        [n_sfk * vol_cf, n_grb2 * vol_cf, n_gab1 * vol_cf, n_shp2 * vol_cf,
         n_egfr * surf_cf],
        dtype=dtype,
    )


def default_co(R: float = 10.0, dtype=jnp.float64) -> jax.Array:
    """Base-model abundances: 6e5 copies/cell of each protein
    (``Julia/run_base_model.jl:71-76``)."""
    return co_from_copies(6.0e5, 6.0e5, 6.0e5, 6.0e5, 6.0e5, R=R, dtype=dtype)


def hela_co(R: float = 10.0, dtype=jnp.float64) -> jax.Array:
    """HeLa abundances (``Julia/run_base_model_HeLa.jl:71-81``):
    SFK 1.66e5, GRB2 6.28e5, GAB1 1.53e3, SHP2 3.00e5, EGFR 9.3e4."""
    return co_from_copies(1.66e5, 6.28e5, 1.53e3, 3.0e5, 9.3e4, R=R, dtype=dtype)


def param_names() -> Tuple[str, ...]:
    return PNAMES


def co_names() -> Tuple[str, ...]:
    return CO_NAMES


def stability_dt(params: Params, dr: float) -> jax.Array:
    """The reference's explicit-Euler stability bound
    ``dt = 0.99 / (2 (max(D)/dr^2 + sum(k)/4))`` (``basepdesolver.jl:30``)."""
    return 0.99 / (2.0 * (jnp.max(params.D, axis=-1) / dr**2
                          + jnp.sum(params.k, axis=-1) / 4.0))


def load_ensemble_csv(path: str) -> np.ndarray:
    """Load a (N, 24) parameter-ensemble CSV in reference column order
    (``Julia/parameter_ensemble.csv`` header = PNAMES)."""
    import pandas as pd

    df = pd.read_csv(path)
    return df[list(PNAMES)].to_numpy()
