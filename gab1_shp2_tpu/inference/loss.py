"""Fitting loss and the Bayesian model for the 4-parameter inference.

Port of the reference's ``loss``
(``param_fitting+inference_finitediff.jl:188-226``) and ``turing_model``
(``:308-370``): the observable is the % SHP2-bound GAB1 at 5 min EGF,
the fit datum is mu=26.426 with lognormal sigma from the
protocol-transformed experimental spread.

Design decisions (documented deviations):

  * gradients flow through the *stiff* TRBDF2 solve by forward-mode AD
    (4 tangents) instead of ForwardDiff through the 1e5-step explicit
    loop — same differentiate-through-the-solver strategy, ~100x fewer
    steps; the explicit path remains available for parity checks.
  * the reference draws the 15 non-inferred parameters fresh from the
    priors *inside* the likelihood (``:336-349``), making the density
    stochastic across leapfrog steps.  Here ``nuisance="mode"``
    (default) fixes them at the prior modes for a deterministic,
    reproducible posterior; ``nuisance="sample"`` reproduces the
    reference's pseudo-marginal behavior with a supplied PRNG key.
  * the reference recenters the fitted-parameter priors at the MAP
    with the *first evidence row's* spread (``:295-303`` uses
    ``expts_df.errs[1]``, i.e. kG2f's 1.1x), which contradicts the
    shipped posterior's multi-decade spread; the shipped chains are
    only consistent with the original wide priors (sigma = log(10)),
    so those are the default here.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gab1_shp2_tpu.models.observables import pct_shp2_bound_gab1
from gab1_shp2_tpu.models.params import (
    EXPTL_PCT_SHP2_BOUND_GAB1,
    Params,
    default_co,
    default_params,
)
from gab1_shp2_tpu.models.species import K_NAMES
from gab1_shp2_tpu.models.system import ReactionDiffusionSystem, base_system
from gab1_shp2_tpu.ops.trbdf2 import solve_stiff

FIT_NAMES = ("kG1p", "kG1dp", "kSa", "kSi")
_FIT_K_IDX = tuple(K_NAMES.index(n) for n in FIT_NAMES)

# lognormal (mu, sigma) of the fit datum, from the protocol transform of
# (26.426 +- 9.363) (param_fitting+inference_finitediff.jl:113-114)
DATUM_MU = EXPTL_PCT_SHP2_BOUND_GAB1[0]
DATUM_SIGMA = math.sqrt(math.log(
    1.0 + (EXPTL_PCT_SHP2_BOUND_GAB1[1] / EXPTL_PCT_SHP2_BOUND_GAB1[0]) ** 2))


def set_fitted(params: Params, log_k4: jax.Array) -> Params:
    """Insert exp(log_k4) into the four fitted kinetic slots."""
    k = params.k
    for j, idx in enumerate(_FIT_K_IDX):
        k = k.at[..., idx].set(jnp.exp(log_k4[..., j]))
    return Params(D=params.D, k=k)


def make_observable_fn(
    system: Optional[ReactionDiffusionSystem] = None,
    Co=None,
    base: Optional[Params] = None,
    *,
    R: float = 10.0,
    dr: float = 0.2,
    tf: float = 5.0,
    rtol: float = 1e-4,
    atol: float = 1e-7,
    method: str = "trbdf2",
    linsolve_dtype=None,
) -> Callable[[jax.Array], jax.Array]:
    """Returns ``f(log_k4) -> pct_shp2_bound_gab1`` via the stiff solve.

    Default configuration mirrors the reference fit (dr=0.2, tf=5;
    the likelihood's solver tolerance ``rtol=1e-4`` as in
    ``turing_model``'s ``rtol`` kwarg).  ``method`` keeps the
    committed-artifact default (trbdf2); ``"rodas4"`` solves the same
    objective in ~2-3x fewer steps (AD-validated).
    ``linsolve_dtype=jnp.float32`` enables the GSA-validated mixed
    recipe (f64 state + f32 linear algebra) — on TPU this avoids
    emulated-f64 factorizations, the lever that makes the exact
    likelihood NUTS-affordable on-device."""
    system = system or base_system()
    Co = default_co() if Co is None else Co
    base = base or default_params(fit="prior")

    def observable(log_k4: jax.Array) -> jax.Array:
        p = set_fitted(base, log_k4)
        sol = solve_stiff(system, Co, p, R=R, dr=dr, tf=tf, Nts=2,
                          rtol=rtol, atol=atol, method=method,
                          linsolve_dtype=linsolve_dtype)
        return pct_shp2_bound_gab1(sol, Co, R)

    return observable


def chi2_loss(observable: Callable, log_k4: jax.Array,
              mu: float = DATUM_MU,
              sigma: float = EXPTL_PCT_SHP2_BOUND_GAB1[1]) -> jax.Array:
    """The MAP objective ``(mu - y)^2 / sigma^2``
    (``param_fitting+inference_finitediff.jl:218-226``); NaN -> +inf so
    failed solves are rejected, mirroring try/catch -> Inf."""
    y = observable(log_k4)
    val = (mu - y) ** 2 / sigma**2
    return jnp.where(jnp.isfinite(val), val, jnp.inf)


# --- Bayesian model -------------------------------------------------------

def _normal_logpdf(x, mu, sigma):
    return -0.5 * ((x - mu) / sigma) ** 2 - jnp.log(sigma) \
        - 0.5 * math.log(2 * math.pi)


def datum_loglik(y, *, datum: float = DATUM_MU,
                 datum_sigma: float = DATUM_SIGMA):
    """Log likelihood of the fit datum given a model observable ``y``:
    ``datum ~ truncated(LogNormal(log y, sigma), upper=100)``
    (``param_fitting+inference_finitediff.jl:368``).  Broadcasts."""
    y = jnp.where(jnp.isfinite(y) & (y > 0), y, 1e-10)
    log_datum = math.log(datum)
    ll = _normal_logpdf(log_datum, jnp.log(y), datum_sigma) - log_datum
    z = (math.log(100.0) - jnp.log(y)) / datum_sigma
    return ll - jax.scipy.stats.norm.logcdf(z)


def prior_box(n_sigma_lo: float = 5.0, pad_hi: float = 0.3,
              trunc_decades: float = 3.0):
    """Support box for surrogate construction: ``mu - n_sigma_lo*sigma``
    up to the prior truncation point plus a barrier margin."""
    from gab1_shp2_tpu.priors.literature import build_priors

    ln = build_priors().lognorm
    mu = np.array([ln[n][0] for n in FIT_NAMES])
    sigma = np.array([ln[n][1] for n in FIT_NAMES])
    lo = mu - n_sigma_lo * sigma
    hi = mu + trunc_decades * math.log(10.0) + pad_hi
    return lo, hi


def make_batch_observable(
    system: Optional[ReactionDiffusionSystem] = None,
    Co=None,
    base: Optional[Params] = None,
    *,
    R: float = 10.0,
    dr: float = 0.2,
    tf: float = 5.0,
    rtol: float = 1e-4,
    atol: float = 1e-7,
    method: str = "trbdf2",
    linsolve_dtype=None,
    max_steps: int = 20_000,
    chunk: int = 256,
):
    """Chunked batched observable: (B, 4) log-parameters -> (B,) y.

    The lane-minor batch integrator makes the grid sweeps behind the
    amortized NUTS likelihood (``inference/surrogate.py``) and the
    exact reweighting pass single-dispatch ensemble solves.  Failed
    lanes return NaN (masked by the caller)."""
    import jax.numpy as jnp_

    from gab1_shp2_tpu.ops.batch_stiff import solve_stiff_batch

    system = system or base_system()
    Co = default_co() if Co is None else Co
    base = base or default_params(fit="prior")

    @jax.jit
    def run_chunk(log_k4):
        B = log_k4.shape[0]
        pbase = Params(D=jnp_.broadcast_to(base.D, (B,) + base.D.shape),
                       k=jnp_.broadcast_to(base.k, (B,) + base.k.shape))
        p = set_fitted(pbase, log_k4)
        sol, stats = solve_stiff_batch(system, Co, p, R=R, dr=dr, tf=tf,
                                       Nts=2, rtol=rtol, atol=atol,
                                       method=method,
                                       linsolve_dtype=linsolve_dtype,
                                       max_steps=max_steps,
                                       return_stats=True)
        y = pct_shp2_bound_gab1(sol, Co, R)
        return jnp_.where(stats.failed, jnp_.nan, y)

    def batch_obs(Q: np.ndarray) -> np.ndarray:
        Q = np.asarray(Q, float)
        outs = []
        for s in range(0, len(Q), chunk):
            blk = Q[s:s + chunk]
            pad = chunk - len(blk)
            if pad:
                blk = np.concatenate([blk, np.repeat(blk[-1:], pad, 0)])
            y = np.asarray(run_chunk(jnp.asarray(blk)))
            outs.append(y[: chunk - pad] if pad else y)
        return np.concatenate(outs)

    return batch_obs


def make_log_posterior(
    observable: Callable,
    *,
    prior_mu: Optional[np.ndarray] = None,
    prior_sigma: Optional[np.ndarray] = None,
    trunc_decades: float = 3.0,
    datum: float = DATUM_MU,
    datum_sigma: float = DATUM_SIGMA,
    wrap_vjp: bool = True,
) -> Callable[[jax.Array], jax.Array]:
    """Log posterior over q = log(kG1p, kG1dp, kSa, kSi).

    Priors: LogNormal(mu_i, sigma_i) truncated at mode*10^trunc_decades
    (``param_fitting+inference_finitediff.jl:329-332``) — in log space a
    normal with an upper bound, enforced by a steep quadratic barrier so
    the density stays differentiable for NUTS.  Likelihood: see
    :func:`datum_loglik`.

    ``wrap_vjp=False`` skips the forward-mode VJP wrapper — use it for
    observables that are natively reverse-differentiable (the Chebyshev
    surrogate), keeping NUTS gradients at one backward pass.
    """
    if prior_mu is None:
        from gab1_shp2_tpu.priors.literature import build_priors

        ln = build_priors().lognorm
        prior_mu = np.array([ln[n][0] for n in FIT_NAMES])
        prior_sigma = np.array([ln[n][1] for n in FIT_NAMES])
    prior_mu = jnp.asarray(prior_mu)
    prior_sigma = jnp.asarray(prior_sigma)
    qmax = prior_mu + trunc_decades * math.log(10.0)
    # Hard support gate: the solver is only evaluated on a clipped q,
    # and the density is -inf outside.  The box is far in the prior
    # tail (8 sigma below the mode / one e-fold past the truncation
    # barrier, relative density < e-30), so it carries no posterior
    # mass — but during early warmup, large trial steps can propose
    # exp(q) ~ e^700, where the stiff solve overflows and its forward
    # tangents go NaN.  Clipping keeps the solve (and its JVPs) on
    # sane inputs; the -inf outside makes such proposals clean
    # divergences (Stan's rejection semantics) instead of NaNs.
    support_lo = prior_mu - 8.0 * prior_sigma
    support_hi = qmax + 1.0

    def logpost_fwdonly(q: jax.Array) -> jax.Array:
        # the density follows q's dtype (f32 chains must stay f32
        # end-to-end: a single f64 prior constant would promote the
        # NUTS tree carries and break the while_loop carry types)
        mu = prior_mu.astype(q.dtype)
        sigma = prior_sigma.astype(q.dtype)
        lp = jnp.sum(_normal_logpdf(q, mu, sigma))
        # steep smooth barrier for the upper truncation
        over = jnp.maximum(q - qmax.astype(q.dtype), 0.0)
        lp = lp - 1e4 * jnp.sum(over**2)
        q_s = jnp.clip(q, support_lo.astype(q.dtype),
                       support_hi.astype(q.dtype))
        ll = datum_loglik(observable(q_s), datum=datum,
                          datum_sigma=datum_sigma)
        inside = jnp.all((q >= support_lo.astype(q.dtype))
                         & (q <= support_hi.astype(q.dtype)))
        return jnp.where(inside, (lp + ll).astype(q.dtype), -jnp.inf)

    if not wrap_vjp:
        return logpost_fwdonly
    return reverse_differentiable(logpost_fwdonly)


def reverse_differentiable(f: Callable, *,
                           bad_value: float = -jnp.inf) -> Callable:
    """Route a scalar function's VJP through forward-mode AD.

    The stiff integrator's adaptive ``while_loop``s have no reverse
    rule; with 4 fitted parameters a jacfwd costs 4 extra tangent
    solves, so reverse-mode callers (NUTS's value_and_grad, optax's
    zoom linesearch) get exact gradients at forward-mode cost.

    ``bad_value`` is the sentinel for points where the value or
    gradient is non-finite.  The default (-inf) implements Stan
    rejection semantics for MAXIMIZED log-densities; MINIMIZED
    objectives (``map_fit.lbfgs_minimize``) must pass ``+inf`` instead
    — a -inf "loss" would read to a linesearch as a perfect step and
    suck the iterate into the failure region."""

    @jax.custom_vjp
    def g(x):
        return f(x)

    def g_fwd(x):
        # fused value+jacfwd: one vmapped jvp over the 4 basis tangents
        # computes the primal ONCE (the while_loop batching keeps the
        # tangent-independent primal carry unbatched) instead of the
        # separate f(x) + jacfwd(f)(x) pair — for the exact PDE
        # likelihood that removes a full extra stiff solve per
        # gradient evaluation
        basis = jnp.eye(x.shape[-1], dtype=x.dtype)
        v, grad = jax.vmap(lambda t: jax.jvp(f, (x,), (t,)),
                           out_axes=(None, 0))(basis)
        # A point where the density or its gradient is non-finite is
        # outside the usable support — report the sentinel (the
        # sampler treats the proposal as a divergence; a minimizer's
        # linesearch rejects the trial step) with a zero gradient,
        # never NaN (which would poison warmup adaptation;
        # near-failure stiff solves can yield finite values with NaN
        # forward tangents).
        bad = jnp.logical_or(~jnp.isfinite(v),
                             ~jnp.all(jnp.isfinite(grad)))
        v = jnp.where(bad, jnp.asarray(bad_value, v.dtype), v)
        grad = jnp.where(bad, jnp.zeros_like(grad), grad)
        return v, grad

    def g_bwd(grad, ct):
        return (ct * grad,)

    g.defvjp(g_fwd, g_bwd)
    return g
