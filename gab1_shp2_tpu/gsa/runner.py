"""GSA drivers: batched model evaluation + index estimation.

Reproduces the reference's eFAST workloads
(``GSA_diffs+kinetic-params_MoL.jl``, ``GSA_concs.jl``): 6 summary
outputs per sample, bounds = baseline x/÷1000 in log space for the 24
diffusivity+kinetic parameters, or x2e-4..x2 for the 5 initial
concentrations.  The 24,000-solve batch is one chunked/vmapped stiff
ensemble call; failed lanes contribute zeros
(``sapdesolver.jl:363-366``).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gab1_shp2_tpu.models.observables import gsa_outputs
from gab1_shp2_tpu.models.params import Params
from gab1_shp2_tpu.models.system import ReactionDiffusionSystem
from gab1_shp2_tpu.gsa.efast import (
    EFASTDesign,
    efast_design,
    efast_indices,
    log_bounds_around,
)
from gab1_shp2_tpu.gsa.sobol import SobolDesign, sobol_design, sobol_indices
from gab1_shp2_tpu.ops.batch_stiff import solve_stiff_batch, solve_stiff_refill

GSA_VAR_NAMES = ("r_1/2, SFK", "r_1/10, SFK", "r_1/2, pG1S2",
                 "r_1/10, pG1S2", "[pG1S2]_cent:surf", "[pG1S2]_average")


def make_param_evaluator(system: ReactionDiffusionSystem, Co, *,
                         R: float = 10.0, dr: float = 0.2, tf: float = 5.0,
                         rtol: float = 1e-4, atol: float = 1e-7,
                         chunk: int = 256, method: str = "rodas4",
                         dtype=None, max_steps: int = 2000,
                         linsolve_dtype=None, scheduler: str = "refill",
                         ) -> Callable[[np.ndarray], np.ndarray]:
    """Batch evaluator over packed 24-parameter vectors -> (N, 6).

    ``max_steps`` caps the adaptive step count: eFAST bounds span six
    decades, and a few pathological corners of that box would otherwise
    dominate the lock-step batch wall-clock; capped-out lanes report
    zeros exactly like the reference's ``on_error=zeros(6)``
    (``sapdesolver.jl:363-366``).

    ``scheduler="refill"`` (default since round 4) dispatches through
    the lane-refill continuation scheduler — measured 2.3x the
    cost-sorted chunking over the eFAST corner box (1038 vs 450
    solves/s, v5e 2026-08-19, scripts/bench_refill.py) because a
    pathological corner stalls only its own lane, never a chunk;
    ``"sorted"`` restores the round-3 proxy-sorted chunk dispatch
    (results agree to f32 roundoff)."""
    if dtype is not None:
        Co = jnp.asarray(Co).astype(dtype)

    if scheduler == "refill":
        def refill(packed):
            pb = Params.unpack(packed.astype(jnp.asarray(Co).dtype))
            out, ok, _ = solve_stiff_refill(
                system, Co, pb, extract=_GSAExtract(R), R=R, dr=dr, tf=tf,
                Nts=2, rtol=rtol, atol=atol, method=method,
                max_steps=max_steps, linsolve_dtype=linsolve_dtype)
            return jnp.where(ok[:, None], out, jnp.zeros_like(out))

        return _refill_batch(refill)
    elif scheduler != "sorted":
        raise ValueError(f"unknown scheduler {scheduler!r}")

    def batch(packed):
        pb = Params.unpack(packed.astype(Co.dtype))
        sol, stats = solve_stiff_batch(system, Co, pb, R=R, dr=dr, tf=tf,
                                       Nts=2, rtol=rtol, atol=atol,
                                       method=method, max_steps=max_steps,
                                       linsolve_dtype=linsolve_dtype,
                                       return_stats=True)
        out = gsa_outputs(sol, R)
        ok = jnp.logical_and(~stats.failed, jnp.isfinite(out).all(axis=-1))
        return jnp.where(ok[:, None], out, jnp.zeros_like(out))

    return _chunked_batch(batch, chunk)


def make_conc_evaluator(system: ReactionDiffusionSystem, params: Params, *,
                        R: float = 10.0, dr: float = 0.2, tf: float = 5.0,
                        rtol: float = 1e-4, atol: float = 1e-7,
                        chunk: int = 256, method: str = "rodas4",
                        dtype=None, max_steps: int = 2000,
                        linsolve_dtype=None, scheduler: str = "refill",
                        ) -> Callable[[np.ndarray], np.ndarray]:
    """Batch evaluator over initial-concentration 5-vectors -> (N, 6)
    (the concentration GSA, ``GSA_concs.jl``); ``scheduler`` as in
    :func:`make_param_evaluator`."""
    if dtype is not None:
        params = Params(D=params.D.astype(dtype), k=params.k.astype(dtype))

    if scheduler == "refill":
        def refill(co):
            B = co.shape[0]
            pb = Params(
                D=jnp.broadcast_to(params.D, (B,) + params.D.shape),
                k=jnp.broadcast_to(params.k, (B,) + params.k.shape))
            out, ok, _ = solve_stiff_refill(
                system, co.astype(params.D.dtype), pb,
                extract=_GSAExtract(R), R=R, dr=dr, tf=tf, Nts=2,
                rtol=rtol, atol=atol, method=method, max_steps=max_steps,
                linsolve_dtype=linsolve_dtype)
            return jnp.where(ok[:, None], out, jnp.zeros_like(out))

        return _refill_batch(refill)
    elif scheduler != "sorted":
        raise ValueError(f"unknown scheduler {scheduler!r}")

    def batch(co):
        B = co.shape[0]
        pb = Params(D=jnp.broadcast_to(params.D, (B,) + params.D.shape),
                    k=jnp.broadcast_to(params.k, (B,) + params.k.shape))
        sol, stats = solve_stiff_batch(system, co.astype(params.D.dtype),
                                       pb, R=R, dr=dr, tf=tf,
                                       Nts=2, rtol=rtol, atol=atol,
                                       method=method, max_steps=max_steps,
                                       linsolve_dtype=linsolve_dtype,
                                       return_stats=True)
        out = gsa_outputs(sol, R)
        ok = jnp.logical_and(~stats.failed, jnp.isfinite(out).all(axis=-1))
        return jnp.where(ok[:, None], out, jnp.zeros_like(out))

    return _chunked_batch(batch, chunk)


class _GSAExtract:
    """Per-lane GSA reducer, hashable by value so repeated evaluator
    builds with the same ``R`` share one jit cache entry."""

    def __init__(self, R: float):
        self.R = float(R)

    def __call__(self, sol):
        return gsa_outputs(sol, self.R)

    def __hash__(self):
        return hash((type(self), self.R))

    def __eq__(self, other):
        return type(other) is type(self) and other.R == self.R


def _refill_batch(refill_fn, group: int = 2048):
    """Dispatch an evaluator through the lane-refill scheduler.

    No cost sorting needed: the refill queue packs lanes continuously,
    so a pathological corner only ever stalls its own lane (the
    lock-step chunk barrier the sorting worked around is gone).
    ``group`` bounds the members per device program to stay well under
    the TPU runtime's ~60 s single-execution watchdog even at
    pathological-corner throughput.
    """

    def evaluate(X: np.ndarray) -> np.ndarray:
        Xh = jnp.asarray(np.asarray(X))
        n = Xh.shape[0]
        outs = []
        for s in range(0, n, group):
            blk = Xh[s:s + group]
            # pad the tail to a multiple of 256 so odd tails reuse at
            # most a handful of cached executables instead of paying a
            # fresh multi-minute TPU compile per design size
            pad = (-blk.shape[0]) % 256
            if pad:
                blk = jnp.concatenate([blk, blk[-1:].repeat(pad, 0)], axis=0)
            o = refill_fn(blk)
            outs.append(np.asarray(o)[:blk.shape[0] - pad])
        return np.concatenate(outs, axis=0)

    return evaluate


def _chunked_batch(batch_fn, chunk: int):
    """Chunked dispatch of an already-batched evaluator.

    ``batch_fn`` maps a (chunk, d) array to (chunk, 6) outputs in one
    device program (the lane-minor integrator batches internally — no
    vmap wrapper needed)."""

    def evaluate(X: np.ndarray) -> np.ndarray:
        Xh = np.asarray(X)
        n = Xh.shape[0]
        # cost-sorted chunking: a vmapped adaptive solve runs lock-step,
        # so a chunk costs its *stiffest* member.  Sorting samples by a
        # stiffness proxy (total rate mass, which drives the step count)
        # makes chunks homogeneous and cuts the lock-step waste.
        if Xh.shape[1] == 24:
            cost = Xh[:, 7:].sum(axis=1)  # sum of kinetic rates
        else:
            cost = Xh.sum(axis=1)
        order = np.argsort(cost)
        Xs = jnp.asarray(Xh[order])
        outs = []
        for s in range(0, n, chunk):
            blk = Xs[s:s + chunk]
            pad = chunk - blk.shape[0]
            if pad:
                blk = jnp.concatenate([blk, blk[-1:].repeat(pad, 0)], axis=0)
            o = batch_fn(blk)
            outs.append(np.asarray(o[: chunk - pad if pad else chunk]))
        sorted_out = np.concatenate(outs, axis=0)
        out = np.empty_like(sorted_out)
        out[order] = sorted_out
        return out

    return evaluate


def run_efast(evaluate: Callable[[np.ndarray], np.ndarray],
              bounds: np.ndarray, *, samples: int = 1000,
              num_harmonics: int = 4, log_space: bool = True,
              resamples: int = 1,
              seed: int = 123) -> Tuple[np.ndarray, np.ndarray, EFASTDesign]:
    """Full eFAST sweep: design -> batched evaluation -> (S1, ST).

    ``resamples > 1`` draws that many random-phase search curves per
    parameter and pools their spectra (see
    :func:`gab1_shp2_tpu.gsa.efast.efast_indices`), cutting estimator
    variance at proportionally more model evaluations."""
    design = efast_design(bounds, samples, num_harmonics=num_harmonics,
                          log_space=log_space, resamples=resamples,
                          rng=np.random.default_rng(seed))
    Y = evaluate(design.X)
    _log_dropped(Y)
    S1, ST = efast_indices(Y, design, num_harmonics=num_harmonics)
    return S1, ST, design


def _log_dropped(Y: np.ndarray) -> None:
    """No silent caps: failed samples enter the spectra as zeros (the
    reference's on_error=zeros idiom) and bias the indices if numerous —
    always report how many were dropped."""
    zero = float((np.abs(np.asarray(Y)).sum(axis=-1) == 0).mean())
    if zero > 0:
        print(f"[gsa] {zero:.1%} of model evaluations failed/capped and "
              f"enter the estimator as zeros")


def run_sobol(evaluate: Callable[[np.ndarray], np.ndarray],
              bounds: np.ndarray, *, n: int = 512, log_space: bool = True,
              seed: int = 123) -> Tuple[np.ndarray, np.ndarray, SobolDesign]:
    """Full Sobol sweep with Saltelli sampling and Jansen estimators."""
    design = sobol_design(bounds, n, log_space=log_space, seed=seed)
    Y = evaluate(design.X)
    _log_dropped(Y)
    S1, ST = sobol_indices(Y, design)
    return S1, ST, design


def dk_bounds(params: Params, factor: float = 1000.0) -> np.ndarray:
    """Diffusivity+kinetics bounds, baseline x/÷1000
    (``GSA_diffs+kinetic-params_MoL.jl:68-74``)."""
    return log_bounds_around(np.asarray(params.pack()), factor)


def conc_bounds(Co, lo: float = 2e-4, hi: float = 2.0) -> np.ndarray:
    """Concentration bounds x2e-4 .. x2 (``GSA_concs.jl:62-71``)."""
    co = np.asarray(Co, float)
    return np.stack([co * lo, co * hi], axis=1)
