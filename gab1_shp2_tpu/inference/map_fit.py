"""Multistart MAP fitting (TikTak-style global + LBFGS local).

Replaces the reference's ``TikTak(101) + NLopt.LD_LBFGS`` two-stage fit
(``param_fitting+inference_finitediff.jl:254-266``):

  * global stage: Sobol points over the log-space box, all evaluated in
    one vmapped batch (the reference evaluates them serially),
  * local stage: LBFGS (optax, zoom linesearch) from the best starts,
    with gradients by forward-mode AD through the stiff solver,
  * a second refinement at finer dr mirrors the reference's
    dr=0.2 -> dr=0.1 stage structure.

Bounds are +-``decades`` around the baseline in log space
(``:180-184``), enforced by projection.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import qmc

import optax
import optax.tree_utils as otu

from gab1_shp2_tpu.inference.loss import (
    FIT_NAMES,
    chi2_loss,
    make_observable_fn,
    reverse_differentiable,
)


class FitResult(NamedTuple):
    log_k4: np.ndarray      # best point (log space)
    values: dict            # name -> fitted value
    loss: float
    starts: np.ndarray      # global-stage points
    start_losses: np.ndarray


def fwd_value_and_grad(f: Callable) -> Callable:
    """value_and_grad via forward-mode (jacfwd) — reverse mode cannot
    differentiate through the integrator's while_loops, and with 4
    parameters forward mode is cheaper anyway."""

    def vg(x):
        return f(x), jax.jacfwd(f)(x)

    return vg


def lbfgs_minimize(f: Callable, x0: jax.Array, *, max_iters: int = 30,
                   lb=None, ub=None) -> Tuple[jax.Array, jax.Array]:
    """Projected LBFGS with zoom linesearch (optax)."""
    opt = optax.lbfgs()
    # +inf sentinel: this wraps a MINIMIZED chi2 loss — a failed solve
    # must look like a rejected trial step to the zoom linesearch, not
    # a perfect one (ADVICE r4)
    f = reverse_differentiable(f, bad_value=jnp.inf)
    vg = jax.value_and_grad(f)

    def project(x):
        if lb is not None:
            x = jnp.clip(x, lb, ub)
        return x

    def step(carry, _):
        x, state = carry
        val, grad = vg(x)
        updates, state = opt.update(grad, state, x, value=val, grad=grad,
                                    value_fn=f)
        x = project(optax.apply_updates(x, updates))
        return (x, state), val

    (x, _), vals = jax.lax.scan(step, (x0, opt.init(x0)), None,
                                length=max_iters)
    return x, f(x)


def map_fit(
    *,
    base=None,
    Co=None,
    system=None,
    n_starts: int = 101,
    n_local: int = 8,
    decades: float = 2.0,
    max_iters: int = 30,
    dr_coarse: float = 0.2,
    dr_fine: float = 0.1,
    rtol: float = 1e-4,
    seed: int = 123,
) -> FitResult:
    """Two-stage multistart MAP fit of (kG1p, kG1dp, kSa, kSi).

    Stage 1: ``n_starts`` Sobol points at ``dr_coarse``, vmapped; LBFGS
    from the ``n_local`` best.  Stage 2: LBFGS refinement of the winner
    at ``dr_fine`` (reference structure, ``:254-266``).
    """
    from gab1_shp2_tpu.models.params import default_params

    base = base or default_params(fit="prior")
    center = jnp.log(jnp.stack([getattr(base, n) for n in FIT_NAMES]))
    lb = center - decades * math.log(10.0)
    ub = center + decades * math.log(10.0)

    obs_c = make_observable_fn(system, Co, base, dr=dr_coarse, rtol=rtol)
    f_c = lambda x: chi2_loss(obs_c, x)

    # global stage (batched)
    sampler = qmc.Sobol(4, scramble=True, rng=np.random.default_rng(seed))
    u = sampler.random(n_starts)
    starts = jnp.asarray(np.asarray(lb) + u * np.asarray(ub - lb))
    start_losses = jax.jit(jax.vmap(f_c))(starts)
    order = np.argsort(np.asarray(start_losses))

    # local stage from the best starts
    best_x, best_v = None, np.inf
    local = jax.jit(partial(lbfgs_minimize, f_c, max_iters=max_iters,
                            lb=lb, ub=ub))
    for i in order[:n_local]:
        x, v = local(starts[i])
        if float(v) < best_v and np.isfinite(float(v)):
            best_x, best_v = x, float(v)

    # refinement at finer resolution
    obs_f = make_observable_fn(system, Co, base, dr=dr_fine, rtol=rtol)
    f_f = lambda x: chi2_loss(obs_f, x)
    x_fin, v_fin = jax.jit(partial(lbfgs_minimize, f_f,
                                   max_iters=max_iters, lb=lb, ub=ub))(
        best_x)
    if not np.isfinite(float(v_fin)) or float(v_fin) > best_v:
        x_fin, v_fin = best_x, best_v

    vals = {n: float(np.exp(np.asarray(x_fin))[j])
            for j, n in enumerate(FIT_NAMES)}
    return FitResult(log_k4=np.asarray(x_fin), values=vals,
                     loss=float(v_fin), starts=np.asarray(starts),
                     start_losses=np.asarray(start_losses))
