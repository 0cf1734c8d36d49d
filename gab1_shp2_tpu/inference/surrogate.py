"""Amortized PDE likelihood: Chebyshev surrogate of the fit observable.

The reference's NUTS run (``param_fitting+inference_finitediff.jl:403-408``)
pays one stiff PDE solve (plus a finite-difference gradient) per leapfrog
step, distributed over worker processes.  The TPU-native shape of that
workload is *amortization*: the observable ``y(q) = %SHP2-bound GAB1``
is a smooth scalar field over only 4 log-parameters, so we

  1. evaluate it once on an ``n^4`` tensor grid of Chebyshev nodes with
     the lane-minor batched stiff integrator (one chunked ensemble
     dispatch — minutes on a single chip),
  2. transform to Chebyshev coefficients (DCT-I per axis), and
  3. hand NUTS a jittable, exactly differentiable polynomial evaluator
     (Chebyshev recurrence + tensor contraction, ~1e5 FLOPs/eval).

Correctness is *not* delegated to the surrogate: the inference driver
re-evaluates the exact PDE likelihood at every posterior draw (one more
batched ensemble dispatch) and importance-reweights, reporting the
effective sample size — the published quantiles are exact up to ESS,
the surrogate only shapes the proposal trajectory.

The interpolated quantity is ``log(y + floor)``: y spans decades over
the prior box and is lognormal-observed, so log-space interpolation
matches both the function's scale and the likelihood's geometry.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Y_FLOOR = 1e-12


class ChebSurrogate(NamedTuple):
    """Tensor-product Chebyshev interpolant of log(y + floor) over a box."""

    coef: jax.Array   # (n, n, n, n) Chebyshev coefficients
    lo: jax.Array     # (4,) box lower corner (log-parameter space)
    hi: jax.Array     # (4,) box upper corner

    def log_y(self, q: jax.Array) -> jax.Array:
        """Interpolated log(y + floor) at ``q`` (4,); clamps to the box.

        Clamping is safe: the prior places ~1e-7 of its mass outside the
        default box, and the exact reweighting pass corrects any draw
        that lands there anyway.
        """
        x = 2.0 * (q - self.lo) / (self.hi - self.lo) - 1.0
        x = jnp.clip(x, -1.0, 1.0)
        n = self.coef.shape[0]

        def cheb_basis(xi):
            def step(carry, _):
                tkm1, tk = carry
                tkp1 = 2.0 * xi * tk - tkm1
                return (tk, tkp1), tkm1

            (_, _), ts = jax.lax.scan(
                step, (jnp.ones_like(xi), xi), None, length=n)
            return ts  # (n,)

        T = jax.vmap(cheb_basis)(x)  # (4, n)
        c = jnp.einsum("ijkl,i->jkl", self.coef, T[0])
        c = jnp.einsum("jkl,j->kl", c, T[1])
        c = jnp.einsum("kl,k->l", c, T[2])
        return jnp.einsum("l,l->", c, T[3])

    def y(self, q: jax.Array) -> jax.Array:
        return jnp.exp(self.log_y(q))


def cheb_nodes(n: int) -> np.ndarray:
    """Chebyshev points of the second kind on [-1, 1], ascending."""
    return np.cos(np.pi * np.arange(n)[::-1] / (n - 1))


def _dct1_coeffs(vals: np.ndarray) -> np.ndarray:
    """Chebyshev coefficients from values at second-kind nodes, per axis.

    Uses the DCT-I relation: for values f_j at x_j = cos(pi j / (n-1))
    (descending j), coefficients c_k = (2 - [k in {0, n-1}]) / (2(n-1))
    * DCT-I(f)_k.
    """
    from scipy.fft import dct

    n = vals.shape[0]
    out = vals
    for axis in range(vals.ndim):
        v = np.moveaxis(out, axis, 0)
        # DCT-I expects descending-x (j = 0 at x=+1) ordering
        v = v[::-1]
        c = dct(v, type=1, axis=0) / (n - 1)
        c[0] /= 2.0
        c[-1] /= 2.0
        out = np.moveaxis(c, 0, axis)
    return out


def build_surrogate(batch_observable: Callable[[np.ndarray], np.ndarray],
                    lo: np.ndarray, hi: np.ndarray, *, n: int = 17,
                    chunk: int = 256,
                    progress: Optional[Callable[[int, int], None]] = None,
                    ) -> Tuple[ChebSurrogate, np.ndarray]:
    """Evaluate ``batch_observable`` on the n^4 Chebyshev grid and fit.

    ``batch_observable``: (B, 4) log-parameter array -> (B,) observable
    values (NaN/non-finite allowed; replaced by the floor).  Returns the
    surrogate and the raw grid values (n, n, n, n) for diagnostics.
    """
    lo = np.asarray(lo, float)
    hi = np.asarray(hi, float)
    t = cheb_nodes(n)
    axes = [lo[i] + (hi[i] - lo[i]) * (t + 1.0) / 2.0 for i in range(4)]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
    Q = grid.reshape(-1, 4)

    vals = np.empty(len(Q))
    for s in range(0, len(Q), chunk):
        blk = Q[s:s + chunk]
        pad = chunk - len(blk)
        if pad:
            blk = np.concatenate([blk, np.repeat(blk[-1:], pad, 0)])
        y = np.asarray(batch_observable(blk))
        vals[s:s + chunk - pad if pad else s + chunk] = \
            y[: chunk - pad if pad else chunk]
        if progress is not None:
            progress(min(s + chunk, len(Q)), len(Q))

    vals = vals.reshape((n,) * 4)
    bad = ~np.isfinite(vals) | (vals < 0)
    n_bad = int(bad.sum())
    if n_bad:
        print(f"[surrogate] {n_bad}/{vals.size} grid solves failed; "
              f"clamped to floor")
    logv = np.log(np.where(bad, 0.0, vals) + Y_FLOOR)
    coef = _dct1_coeffs(logv)
    return ChebSurrogate(coef=jnp.asarray(coef), lo=jnp.asarray(lo),
                         hi=jnp.asarray(hi)), vals


def save_surrogate(path: str, sur: ChebSurrogate,
                   grid_vals: np.ndarray) -> None:
    np.savez(path, coef=np.asarray(sur.coef), lo=np.asarray(sur.lo),
             hi=np.asarray(sur.hi), grid_vals=grid_vals)


def load_surrogate(path: str) -> ChebSurrogate:
    z = np.load(path)
    return ChebSurrogate(coef=jnp.asarray(z["coef"]),
                         lo=jnp.asarray(z["lo"]), hi=jnp.asarray(z["hi"]))


def importance_reweight(log_lik_exact: np.ndarray,
                        log_lik_surrogate: np.ndarray
                        ) -> Tuple[np.ndarray, float]:
    """Self-normalized importance weights exact/surrogate + ESS.

    The posterior draws were generated under the surrogate likelihood;
    weighting each draw by ``exp(exact - surrogate)`` makes every
    reported summary exact (up to Monte-Carlo error measured by ESS).
    """
    lw = log_lik_exact - log_lik_surrogate
    finite = np.isfinite(lw)
    if not finite.any():
        raise ValueError(
            "importance_reweight: every draw's exact log-likelihood is "
            "non-finite — the exact PDE re-evaluation failed for all "
            "posterior samples (check solver failures / NaN lanes "
            "upstream); cannot reweight.")
    lw = lw - np.max(lw[finite])
    w = np.where(finite, np.exp(lw), 0.0)
    wsum = w.sum()
    if not np.isfinite(wsum) or wsum <= 0.0:
        raise ValueError(
            "importance_reweight: importance weights sum to zero or "
            "non-finite (all weights underflowed after max-shift); the "
            "surrogate and exact likelihoods disagree too strongly to "
            "reweight (ESS would be 0).")
    w = w / wsum
    ess = float(1.0 / np.sum(w**2))
    return w, ess


def weighted_quantiles(x: np.ndarray, w: np.ndarray, qs) -> np.ndarray:
    """Quantiles of weighted samples (inverse-CDF convention)."""
    order = np.argsort(x)
    xs, ws = x[order], w[order]
    cdf = np.cumsum(ws)
    cdf /= cdf[-1]
    return np.interp(np.asarray(qs), cdf, xs)
