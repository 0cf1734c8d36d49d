"""Vmapped / sharded parameter-ensemble engine.

The reference batches independent PDE solves over parameter sets three
ways — ``Threads.@threads`` + ``ReentrantLock`` (``get_param_posteriors.jl:147``),
``Distributed.pmap`` (``sapdesolver.jl:323``), and ``MCMCDistributed``.
The TPU-native equivalent is one mechanism: ``jax.vmap`` over the
ensemble axis per device, sharded across a device mesh with
``jax.sharding`` for multi-chip runs (see ``gab1_shp2_tpu.parallel``).

Failure isolation is masking, not try/catch: lanes whose solve produced
NaN (or whose stiff integration failed) are dropped from summaries the
way the reference skips NaN samples (``get_param_posteriors.jl:155``,
``on_error=zeros`` in ``sapdesolver.jl:363-366``).
"""

from __future__ import annotations

import warnings
from functools import lru_cache, partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gab1_shp2_tpu.models.params import Params, stability_dt
from gab1_shp2_tpu.models.system import ReactionDiffusionSystem
from gab1_shp2_tpu.ops.explicit import solve_explicit
from gab1_shp2_tpu.parallel.mesh import pad_to_multiple
from gab1_shp2_tpu.ops.batch_stiff import (
    solve_stiff_batch,
    solve_stiff_refill,
)


def _identity(sol):
    return sol


def run_ensemble(
    system: ReactionDiffusionSystem,
    Co: jax.Array,
    ensemble,  # (N, 24) packed array or batched Params
    *,
    solver: str = "stiff",
    extract: Callable = _identity,
    R: float = 10.0,
    dr: float = 0.2,
    tf: float = 5.0,
    Nts: int = 100,
    rtol: float = 1e-4,
    atol: float = 1e-7,
    tol: float = 1e-4,
    maxiters: int = 20,
    t_prechase: Optional[float] = None,
    chunk: Optional[int] = None,
    device_axis: Optional[str] = None,
    mesh=None,
    method: str = "rodas4",
    linsolve_dtype=None,
    max_steps: int = 20_000,
    jac_reuse=None,
    scheduler: Optional[str] = None,
    refill_group: Optional[int] = None,
):
    """Solve the PDE for every ensemble member.

    Mirrors ``run_ensemble`` / ``run_ensemble_pc``
    (``get_param_posteriors.jl:135-236``): defaults dr=0.2, tol=1e-4,
    maxiters=20, Nts=100.  ``extract`` maps each member's
    :class:`Solution` to whatever should be kept (default: everything);
    keeping only reduced summaries is how 10k-member ensembles stay in
    HBM.

    Returns ``(out, valid)``: the stacked extracted pytree with leading
    ensemble axis, and a boolean mask of lanes that completed with
    finite output.

    ``chunk`` bounds peak memory by scanning over member chunks.

    ``device_axis`` (a mesh axis name, e.g. ``"ensemble"``) shards the
    stiff ensemble over a 1-D device mesh: every dispatch solves
    ``n_devices * chunk`` members, ``chunk`` per device, through one
    ``shard_map``-partitioned program — the multi-chip equivalent of
    the reference's ``Threads.@threads``/``pmap`` distribution
    (``get_param_posteriors.jl:147``, ``sapdesolver.jl:323``).  The
    pilot-fit cost-sorted schedule is preserved (the pilot is the first
    device-wide super-chunk).  ``mesh`` overrides the default mesh
    (all of ``jax.devices()``); per-lane results are independent of
    device placement.

    ``scheduler`` picks the stiff dispatch strategy: ``"sorted"``
    (pilot-fit cost-sorted chunking) or ``"refill"`` (lane-refill
    continuation batching, ``ops.batch_stiff.solve_stiff_refill``: one
    device program per ``refill_group`` members with finished lanes
    swapped for queued ones in-flight — no lock-step chunk barrier at
    all).  Default (``None``) = auto: refill for every stiff ensemble
    except ``jac_reuse`` (collective refresh votes need fixed chunk
    membership).  Measured vs sorted (v5e): +24% on a 2048-member
    sparse-output posterior and 2.3x on the eFAST corner box
    (scripts/bench_refill.py 2026-08-19); dense output Nts=100 +49%
    (2939 vs 1972 solves/s) and two-leg pulse-chase Nts=120 +6.7%
    (1788 vs 1675) at N=2048 (scripts/bench_refill_dense.py
    2026-08-21 — the former dense-output exclusion was a heuristic the
    measurement overturned; two-leg runs use the per-lane leg switch,
    VERDICT-r4 item 3).  With
    ``device_axis`` every device runs its own independent refill queue
    over its shard.  Per-member results are controller-identical
    between schedulers (exact step counts; values to float roundoff).
    """
    if isinstance(ensemble, Params):
        pb = ensemble
    else:
        pb = Params.unpack(jnp.asarray(ensemble))
    N = pb.k.shape[0]

    # TPU runtime watchdog guard: the axon runtime kills single device
    # executions over ~60 s.  Dense-output runs (large Nts) rewrite the
    # whole (Nts+1, 10, Nr+1, B) snapshot array inside the step loop,
    # so per-chunk wall grows ~linearly with Nts*B; at Nts=120, B=256
    # a pulse-chase ensemble chunk was measured over the limit.  Cap
    # the chunk so dispatches stay comfortably under it.
    if (solver == "stiff" and Nts >= 50 and N > 128
            and jax.devices()[0].platform == "tpu"
            and (chunk is None or chunk > 128)):
        if chunk is not None:
            # jac_reuse refresh decisions are collective per chunk, so
            # changing the chunking changes results at tolerance level —
            # never silently override an explicit request.
            warnings.warn(
                f"run_ensemble: requested chunk={chunk} capped to 128 on "
                f"TPU (Nts={Nts} dense-output dispatches risk the ~60 s "
                "runtime watchdog); pass chunk<=128 to silence.",
                stacklevel=2)
        chunk = 128

    if solver == "stiff":
        # batch-aware lane-minor integrator (ops/batch_stiff.py): one
        # device program per chunk instead of a vmapped per-lane solve.
        # The jitted solver is cached across run_ensemble calls (see
        # _stiff_chunk_solver); pass a *stable* extract function (not a
        # fresh lambda) to hit the cache on repeated calls.
        ls_key = jnp.dtype(linsolve_dtype).name if linsolve_dtype else None
        cfg = (system, float(R), float(dr), float(tf), int(Nts),
               float(rtol), float(atol), t_prechase, method, ls_key,
               int(max_steps), jac_reuse, extract)

        if scheduler is None:
            # refill everywhere except jac_reuse (which needs fixed
            # chunk membership).  The former Nts>=50 exclusion was a
            # heuristic, MEASURED WRONG (v5e 2026-08-21,
            # scripts/bench_refill_dense.py, N=2048 f32 rodas4): dense
            # Nts=100 refill 2939 vs sorted 1972 solves/s (+49%);
            # two-leg pulse-chase Nts=120 refill 1788 vs 1675 (+6.7%);
            # outputs matched the sorted scheduler in both cases.
            scheduler = "refill" if not jac_reuse else "sorted"
        if scheduler == "refill":
            if jac_reuse:
                raise ValueError(
                    "scheduler='refill' is incompatible with jac_reuse "
                    "(collective refresh votes need fixed chunk "
                    "membership); use scheduler='sorted'")
            return _run_stiff_refill(
                system, Co, pb, N, extract, chunk, refill_group,
                R=R, dr=dr, tf=tf, Nts=Nts, rtol=rtol, atol=atol,
                method=method, linsolve_dtype=linsolve_dtype,
                max_steps=max_steps, device_axis=device_axis,
                mesh=mesh, t_prechase=t_prechase)
        elif scheduler != "sorted":
            raise ValueError(f"unknown scheduler {scheduler!r}")
        if device_axis is not None:
            return _run_stiff_sharded(cfg, Co, pb, N, chunk, device_axis,
                                      mesh, sort=not jac_reuse)
        _vs = _stiff_chunk_solver(*cfg)

        def vone_steps(p: Params):
            return _vs(Co, p)

        def vone(p: Params):
            return vone_steps(p)[:2]
    elif device_axis is not None:
        raise NotImplementedError(
            "device_axis sharding is implemented for solver='stiff' (the "
            "production ensemble path); the explicit solver is single-"
            "device — drop device_axis or use solver='stiff'.")
    elif solver == "explicit":
        # shared conservative step: per-member stability dt with a static
        # max step count (reference semantics, basepdesolver.jl:30)
        dts = stability_dt(pb, dr)
        n_steps = int(np.ceil(tf / float(jnp.min(dts))))
        nt_active = jnp.ceil(tf / dts).astype(jnp.int32)

        def one(p_dt, n_steps=n_steps):
            p, dt_i, nt_i = p_dt
            sol = solve_explicit(system, Co, p, R=R, dr=dr, tf=tf, Nts=Nts,
                                 dt=dt_i, n_steps=n_steps, nt_active=nt_i,
                                 maxiters=maxiters, tol=tol,
                                 t_prechase=t_prechase)
            out = extract(sol)
            ok = jnp.isfinite(sol.C[-1]).all()
            return out, ok
    else:
        raise ValueError(f"unknown solver {solver!r}")

    if solver == "explicit":
        batched_args = (pb, dts, nt_active)
        vone = jax.vmap(one)
        if chunk is not None and chunk < N:
            # per-group step counts: lanes in lock-step all pay
            # n_steps of the chunk's stiffest member, so sort by dt
            # and give each chunk its own (quantized) step count
            # instead of the global worst case (one stiff member no
            # longer taxes the whole ensemble).
            return _run_explicit_grouped(one, batched_args, dts, tf,
                                         chunk, N)
    else:
        batched_args = pb
    if chunk is None or chunk >= N:
        if solver == "stiff":
            out, ok = vone(batched_args)  # _vs is already jitted
        else:
            out, ok = jax.jit(vone)(batched_args)
    else:
        # the explicit path returned above; only the stiff path chunks here
        out, ok = _run_stiff_cost_sorted(vone_steps, pb, N, chunk,
                                         sort=not jac_reuse)
    return out, ok


def _run_stiff_refill(system, Co, pb, N, extract, chunk, refill_group, *,
                      R, dr, tf, Nts, rtol, atol, method, linsolve_dtype,
                      max_steps, device_axis=None, mesh=None,
                      t_prechase=None):
    """Dispatch the stiff ensemble through the lane-refill scheduler.

    Each dispatch is ONE device program over ``refill_group`` members
    (``chunk`` lanes, finished lanes refilled in-flight — see
    ``ops.batch_stiff.solve_stiff_refill``).  The group bounds the
    single-execution wall for the TPU runtime's ~60 s watchdog: at the
    sparse-output production configs (Nts=2, >=800 solves/s) the 4096
    default is <6 s; dense-output runs (Nts>=50) inherit the same
    conservative cap as the chunked path.

    With ``device_axis`` each dispatch is one ``shard_map``-partitioned
    program of ``n_devices * refill_group`` members: every device runs
    its own independent refill queue over its shard (queues never
    communicate — the per-device ``while_loop`` trip counts diverge
    freely because no collective sits inside the loop).
    """
    lanes = int(chunk) if chunk is not None else 256
    if refill_group is None:
        # dense output: bound per-dispatch wall under the ~60 s TPU
        # watchdog.  2*lanes is the measured-best dense config
        # (lanes=128 group=256: 2939 solves/s vs 2860 at lanes=256 —
        # scripts/bench_refill_dense.py, N=2048 Nts=100 f32 rodas4,
        # v5e 2026-08-21); each group dispatch was ~0.1 s there, far
        # under the watchdog.
        dense = Nts >= 50 and jax.devices()[0].platform == "tpu"
        refill_group = 2 * lanes if dense else 4096
    group = max(int(refill_group), lanes)

    def solve_group(Co_g, p_g):
        return solve_stiff_refill(
            system, Co_g, p_g, extract=extract, R=R, dr=dr, tf=tf,
            Nts=Nts, rtol=rtol, atol=atol, max_steps=max_steps,
            method=method, linsolve_dtype=linsolve_dtype, lanes=lanes,
            t_prechase=t_prechase)

    co_shared = jnp.asarray(Co).ndim == 1
    if device_axis is not None:
        from jax.sharding import Mesh, PartitionSpec as P

        if mesh is None:
            mesh = Mesh(np.asarray(jax.devices()), (device_axis,))
        elif device_axis not in mesh.axis_names:
            raise ValueError(f"device_axis {device_axis!r} not in mesh "
                             f"axes {mesh.axis_names}")
        D = int(np.prod(mesh.devices.shape))
        co_spec = P() if co_shared else P(device_axis)
        solve_group = jax.shard_map(
            solve_group, mesh=mesh, in_specs=(co_spec, P(device_axis)),
            out_specs=P(device_axis), check_vma=False)
        group *= D

    outs = []
    for s in range(0, N, group):
        p_g = jax.tree_util.tree_map(lambda a: a[s:s + group], pb)
        Co_g = Co if co_shared else Co[s:s + group]
        if device_axis is not None:
            # shards must be equal-size: pad the tail dispatch to a
            # multiple of D (one extra executable for the tail size,
            # same as the single-device path's tail), slice off below
            p_g, n_g = pad_to_multiple(p_g, D)
            if not co_shared:
                Co_g, _ = pad_to_multiple(Co_g, D)
        out, ok, _ = solve_group(Co_g, p_g)
        if device_axis is not None:
            out, ok = jax.tree_util.tree_map(lambda a: a[:n_g], (out, ok))
        outs.append((out, ok))
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *outs)


def _build_chunk_fn(system, R, dr, tf, Nts, rtol, atol, t_prechase,
                    method, ls_key, max_steps, jac_reuse, extract):
    """The raw (unjitted) batched chunk solver ``(Co, p) -> (out, ok,
    steps)``; jitted plain by :func:`_stiff_chunk_solver` and wrapped in
    ``shard_map`` by :func:`_stiff_sharded_solver`."""
    linsolve_dtype = None if ls_key is None else jnp.dtype(ls_key)

    def vone_steps(Co, p: Params):
        sol, stats = solve_stiff_batch(
            system, Co, p, R=R, dr=dr, tf=tf, Nts=Nts, rtol=rtol,
            atol=atol, t_prechase=t_prechase, method=method,
            linsolve_dtype=linsolve_dtype, max_steps=max_steps,
            jac_reuse=jac_reuse, return_stats=True)
        B = p.k.shape[0]
        # restore the vmapped-Solution contract (batched t and r)
        # so per-lane extract functions see the same shapes as before
        sol = sol._replace(
            t=jnp.broadcast_to(sol.t, (B,) + sol.t.shape),
            r=jnp.broadcast_to(sol.r, (B,) + sol.r.shape))
        out = jax.vmap(extract)(sol)
        ok = jnp.logical_and(
            ~stats.failed,
            jnp.isfinite(sol.C[:, -1]).all(axis=(-2, -1)))
        return out, ok, stats.n_accepted + stats.n_rejected

    return vone_steps


@lru_cache(maxsize=64)
def _stiff_chunk_solver(system, R, dr, tf, Nts, rtol, atol, t_prechase,
                        method, ls_key, max_steps, jac_reuse, extract):
    """Build (once per static config) the jitted stiff chunk solver.

    ``run_ensemble`` used to rebuild its jitted closure on every call,
    paying ~5 s of re-tracing plus several seconds of executable-cache
    deserialization per invocation — which dominates small runs and
    repeated-call workloads.  Caching by the static solve configuration
    (``extract`` keyed by function identity) makes repeat calls
    dispatch-only.  ``Co`` is a traced argument, so different initial
    concentrations share one executable.
    """
    return jax.jit(_build_chunk_fn(system, R, dr, tf, Nts, rtol, atol,
                                   t_prechase, method, ls_key, max_steps,
                                   jac_reuse, extract))


@lru_cache(maxsize=64)
def _stiff_sharded_solver(system, R, dr, tf, Nts, rtol, atol, t_prechase,
                          method, ls_key, max_steps, jac_reuse, extract,
                          mesh, axis):
    """The chunk solver shard_mapped over a device mesh.

    Each device runs the *same* lane-minor batched program
    (:func:`_build_chunk_fn`) on its local slice of the leading
    ensemble axis — the multi-chip production path the reference covers
    with ``Threads.@threads`` + ``Distributed.pmap``
    (``get_param_posteriors.jl:147``, ``sapdesolver.jl:323``).  ``Co``
    is replicated; all batched leaves (params in, extracted outputs /
    masks / step counts out) are sharded over ``axis``.  Per-lane
    trajectories are independent, so device placement never changes a
    lane's result.
    """
    from jax.sharding import PartitionSpec as P

    fn = _build_chunk_fn(system, R, dr, tf, Nts, rtol, atol, t_prechase,
                         method, ls_key, max_steps, jac_reuse, extract)
    # the per-shard program is lane-local, but its while_loop carries
    # start from replicated constants, which the varying-manual-axes
    # checker rejects — skip the check (same as mesh.run_sharded_batch)
    smap = jax.shard_map(fn, mesh=mesh, in_specs=(P(), P(axis)),
                         out_specs=P(axis), check_vma=False)
    return jax.jit(smap)


def _run_stiff_sharded(cfg, Co, pb, N, chunk, device_axis, mesh,
                       sort=True):
    """Dispatch the stiff ensemble over a device mesh.

    Every dispatch is one ``shard_map``-partitioned program solving a
    super-chunk of ``n_devices * chunk`` lanes (``chunk`` per device),
    scheduled by the same pilot-fit cost sorting as the single-device
    path (:func:`_run_stiff_cost_sorted` — the pilot is the whole first
    super-chunk, so the cost model fits on ``n_devices``× more lanes).
    """
    from jax.sharding import Mesh

    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), (device_axis,))
    elif device_axis not in mesh.axis_names:
        raise ValueError(f"device_axis {device_axis!r} not in mesh axes "
                         f"{mesh.axis_names}")
    D = int(np.prod(mesh.devices.shape))
    c = int(chunk) if chunk is not None else -(-N // D)
    super_chunk = D * c

    _vss = _stiff_sharded_solver(*cfg, mesh, device_axis)

    def vone_steps(p: Params):
        return _vss(Co, p)

    # pad the batch itself to a super-chunk multiple (repeat the last
    # member) so the pilot indexing below stays in range even when
    # N < n_devices * chunk; padded lanes are sliced off at the end
    pad = (-N) % super_chunk
    if pad:
        pb = jax.tree_util.tree_map(
            lambda a: jnp.concatenate(
                [a, jnp.repeat(a[-1:], pad, axis=0)], axis=0), pb)
    out, ok = _run_stiff_cost_sorted(vone_steps, pb, N + pad, super_chunk,
                                     sort=sort)
    if pad:
        out, ok = jax.tree_util.tree_map(lambda a: a[:N], (out, ok))
    return out, ok


def _run_stiff_cost_sorted(vone_steps, pb, N, chunk, sort=True):
    """Chunked stiff dispatch with pilot-fit cost-sorted scheduling.

    A vmapped adaptive integration runs until its slowest lane
    finishes, so a chunk costs its max-step member.  Over a posterior
    ensemble the per-lane step count spreads ~2x (measured median 64 /
    max 130 at the production config, rodas4 f32 dr=0.2 rtol 1e-4), so
    randomly-ordered chunks run ~40% slower than perfectly sorted ones.
    No fixed stiffness proxy predicts posterior-lane cost (the GSA
    runner's sum-of-rates proxy measures r = -0.10 there), so the
    schedule is learned on the fly: solve the first chunk as a pilot,
    ridge-fit log(steps) ~ log(params) on its lanes (measured R^2 ~
    0.9), and solve the remaining lanes in predicted-cost order.  This
    captures ~85% of the oracle win — 2058 -> ~2900 solves/s on a
    2048-member posterior ensemble (scripts/probe_sort_chunks.py,
    scripts/probe_step_predictors.py, v5e 2026-08-18).

    Per-lane results are independent of chunk membership (lanes step
    independently; finished lanes idle), so reordering never changes
    results — except under ``jac_reuse``, whose band-refresh votes are
    collective per chunk; callers pass ``sort=False`` there, which
    keeps the original in-order chunking.

    Dispatches are enqueued without host sync (only the pilot chunk is
    fetched, to read its step counts), so the device pipeline stays
    full.
    """
    vone_j = vone_steps  # already jitted by _stiff_chunk_solver

    def take(idx):
        ja = jnp.asarray(idx)
        return jax.tree_util.tree_map(lambda a: a[ja], pb)

    pilot_idx = np.arange(chunk)
    out_p, ok_p, steps_p = vone_j(take(pilot_idx))

    rest = np.arange(chunk, N)
    if sort and rest.size:
        packed = np.asarray(pb.pack(), np.float64)
        X = np.log(np.maximum(packed, 1e-300))
        A = np.column_stack([X[pilot_idx], np.ones(chunk)])
        y = np.log(np.maximum(np.asarray(steps_p, np.float64), 1.0))
        try:
            coef = np.linalg.solve(A.T @ A + 1e-3 * np.eye(A.shape[1]),
                                   A.T @ y)
            pred = np.column_stack([X[rest], np.ones(rest.size)]) @ coef
            if np.isfinite(pred).all():
                rest = rest[np.argsort(pred, kind="stable")]
        except np.linalg.LinAlgError:
            pass  # fall back to the original order

    order = np.concatenate([pilot_idx, rest])
    pad = (-N) % chunk
    sched = np.concatenate([order, np.repeat(order[-1:], pad)])
    outs = [(out_p, ok_p)]
    for s in range(chunk, len(sched), chunk):
        o, k, _ = vone_j(take(sched[s:s + chunk]))
        outs.append((o, k))
    cat = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *outs)
    # rows 0..N-1 of the concatenation hold lanes order[0..N-1] (pad
    # duplicates sit past N); invert the permutation
    inv = np.empty(N, np.int64)
    inv[order] = np.arange(N)
    ja = jnp.asarray(inv)
    return jax.tree_util.tree_map(lambda a: a[:N][ja], cat)


def _run_explicit_grouped(one, batched_args, dts, tf, chunk, N):
    """Chunked explicit ensemble with per-chunk step counts.

    Lanes are sorted by stability dt (descending: cheap first) so each
    chunk's static ``n_steps`` is set by *its own* stiffest member, not
    the global one.  Step counts are rounded up to a geometric
    (ratio-2) grid so at most ~log2(spread) distinct programs compile;
    the extra steps a round-up adds run masked (``nt_active``)."""
    order = np.argsort(-np.asarray(dts), kind="stable")
    inv = np.empty_like(order)
    inv[order] = np.arange(N)
    sorted_args = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a)[order], batched_args)

    pad = (-N) % chunk
    if pad:
        sorted_args = jax.tree_util.tree_map(
            lambda a: jnp.concatenate(
                [a, jnp.repeat(a[-1:], pad, axis=0)], axis=0),
            sorted_args)
    n_tot = N + pad
    dts_sorted = np.asarray(dts)[order]

    def chunk_solver(ca, n_steps):
        return jax.vmap(lambda pd: one(pd, n_steps=n_steps))(ca)

    vone = jax.jit(chunk_solver, static_argnames=("n_steps",))
    outs = []
    for s in range(0, n_tot, chunk):
        ca = jax.tree_util.tree_map(
            lambda a: a[s:s + chunk], sorted_args)
        dt_min = dts_sorted[min(s + chunk, N) - 1]
        n_raw = int(np.ceil(tf / float(dt_min)))
        n_chunk = 1 << max(0, int(np.ceil(np.log2(max(1, n_raw)))))
        outs.append(vone(ca, n_steps=n_chunk))
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0)[:N][inv], *outs)


def masked_quantiles(values: jax.Array, valid: jax.Array,
                     qs=(0.159, 0.5, 0.841)) -> jax.Array:
    """Quantiles over the ensemble axis (axis 0) ignoring invalid lanes.

    Used for the median / 68% credible-interval summary surfaces of the
    analysis drivers (``run_base_model.jl:99-175``).
    """
    v = jnp.where(valid.reshape((-1,) + (1,) * (values.ndim - 1)),
                  values, jnp.nan)
    return jnp.nanquantile(v, jnp.asarray(qs), axis=0)
