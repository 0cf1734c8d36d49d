"""No-U-Turn Sampler with dual-averaging warmup, in pure JAX.

Replaces the reference's ``Turing.sample(model, NUTS(0.65),
MCMCDistributed(), 1000, 5)`` (``param_fitting+inference_finitediff.jl:403-408``)
with a TPU-native sampler:

  * iterative multinomial NUTS (Stan-style) built on ``lax.while_loop``
    with a static maximum tree depth — jit-compatible, so a chain step
    is one compiled program,
  * dual-averaging step-size adaptation to a target acceptance
    statistic (0.65, same as the reference) plus diagonal mass-matrix
    (Welford) adaptation during warmup,
  * chains are just a vmapped axis: ``MCMCDistributed`` over worker
    processes becomes ``vmap`` over chain state (and ``shard_map`` over
    devices for many chains).

The tree is built iteratively with a checkpoint stack of size
``max_depth`` for the left subtree states (the standard trick for
jit-friendly NUTS; recursion is not traceable).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class NUTSState(NamedTuple):
    q: jax.Array          # position
    logp: jax.Array       # log density at q
    grad: jax.Array       # gradient at q
    rng: jax.Array        # PRNG key
    step_size: jax.Array
    inv_mass: jax.Array   # diagonal inverse mass matrix
    # dual averaging state
    log_eps_bar: jax.Array
    h_bar: jax.Array
    mu: jax.Array
    # mass adaptation (Welford)
    w_count: jax.Array
    w_mean: jax.Array
    w_m2: jax.Array


class NUTSInfo(NamedTuple):
    accept_stat: jax.Array
    diverged: jax.Array
    depth: jax.Array
    energy: jax.Array


def init(logdensity: Callable, q0: jax.Array, rng: jax.Array,
         step_size: float = 0.1) -> NUTSState:
    logp, grad = jax.value_and_grad(logdensity)(q0)
    d = q0.shape[0]
    eps = jnp.asarray(step_size, q0.dtype)
    return NUTSState(
        q=q0, logp=logp, grad=grad, rng=rng, step_size=eps,
        inv_mass=jnp.ones((d,), q0.dtype),
        log_eps_bar=jnp.log(eps), h_bar=jnp.zeros((), q0.dtype),
        mu=jnp.log(10.0 * eps),
        w_count=jnp.zeros((), jnp.int32), w_mean=jnp.zeros((d,), q0.dtype),
        w_m2=jnp.zeros((d,), q0.dtype),
    )


def _leapfrog(logdensity, q, p, grad, eps, inv_mass):
    p_half = p + 0.5 * eps * grad
    q_new = q + eps * inv_mass * p_half
    logp_new, grad_new = jax.value_and_grad(logdensity)(q_new)
    p_new = p_half + 0.5 * eps * grad_new
    return q_new, p_new, logp_new, grad_new


def _kinetic(p, inv_mass):
    return 0.5 * jnp.sum(p * inv_mass * p)


_MAX_DELTA = 1000.0  # divergence threshold (Stan's default)


class _C(NamedTuple):
    """NUTS trajectory state, one tree per chain.

    Carries the per-draw constants (``h0``, ``eps``, ``inv_mass``)
    alongside the endpoints/proposal/bookkeeping so a doubling step is
    a pure function of ``_C`` — the host-driven sampler
    (:func:`make_host_tree_sampler`) dispatches one doubling at a time
    and only ever moves this pytree between dispatches."""
    # endpoints of the trajectory in both directions
    q_minus: jax.Array
    p_minus: jax.Array
    g_minus: jax.Array
    q_plus: jax.Array
    p_plus: jax.Array
    g_plus: jax.Array
    # proposal (multinomial sample over the trajectory)
    q_prop: jax.Array
    logp_prop: jax.Array
    g_prop: jax.Array
    # bookkeeping
    log_sum_w: jax.Array      # log total multinomial weight
    sum_p: jax.Array          # sum of momenta (generalized U-turn)
    depth: jax.Array
    turning: jax.Array
    diverged: jax.Array
    sum_accept: jax.Array
    n_accept: jax.Array
    rng: jax.Array
    # per-draw constants
    h0: jax.Array             # initial Hamiltonian energy
    eps: jax.Array            # step size
    inv_mass: jax.Array       # diagonal inverse mass


def _is_turning(inv_mass, q_m, p_m, q_p, p_p):
    dq = q_p - q_m
    return jnp.logical_or(jnp.sum(dq * (inv_mass * p_m)) < 0,
                          jnp.sum(dq * (inv_mass * p_p)) < 0)


def _tree_init(state: NUTSState) -> Tuple[_C, jax.Array]:
    """Sample the momentum and open a fresh (depth-0) trajectory.
    Returns ``(c, rng_next)`` — ``rng_next`` seeds the post-draw chain
    state in :func:`_tree_finish`."""
    d = state.q.shape[0]
    rng, key_mom, key_tree = jax.random.split(state.rng, 3)
    p0 = jax.random.normal(key_mom, (d,), state.q.dtype) / jnp.sqrt(
        state.inv_mass)
    H0 = -state.logp + _kinetic(p0, state.inv_mass)
    c = _C(
        q_minus=state.q, p_minus=p0, g_minus=state.grad,
        q_plus=state.q, p_plus=p0, g_plus=state.grad,
        q_prop=state.q, logp_prop=state.logp, g_prop=state.grad,
        log_sum_w=jnp.zeros((), state.q.dtype), sum_p=p0,
        depth=jnp.zeros((), jnp.int32), turning=jnp.array(False),
        diverged=jnp.array(False),
        sum_accept=jnp.zeros((), state.q.dtype),
        n_accept=jnp.zeros((), state.q.dtype), rng=key_tree,
        h0=H0, eps=state.step_size, inv_mass=state.inv_mass,
    )
    return c, rng


def _tree_cond(c: _C, max_depth: int):
    return jnp.logical_and(
        c.depth < max_depth,
        jnp.logical_and(~c.turning, ~c.diverged))


def _tree_extend(logdensity: Callable, c: _C, *, max_depth: int) -> _C:
    """One trajectory doubling (up to ``2**depth`` leapfrog leaves).

    Masked: when the tree is already finished (turned/diverged/at max
    depth) the leaf loop runs zero iterations and the carry is returned
    unchanged — so a vmapped host loop can keep calling this until
    every chain's tree is done without corrupting finished chains.
    """
    active = _tree_cond(c, max_depth)
    eps, inv_mass, H0 = c.eps, c.inv_mass, c.h0
    qdt = c.q_prop.dtype

    def is_turning(q_m, p_m, q_p, p_p):
        return _is_turning(inv_mass, q_m, p_m, q_p, p_p)

    def empty_like(x):
        return jnp.zeros((max_depth,) + x.shape, x.dtype)

    rng, key_dir, key_acc = jax.random.split(c.rng, 3)
    go_right = jax.random.bernoulli(key_dir)

    n_steps = jnp.where(active, 2 ** c.depth, 0)  # double the trajectory

    # starting endpoint for the new subtree
    q0_ = jnp.where(go_right, c.q_plus, c.q_minus)
    p0_ = jnp.where(go_right, c.p_plus, c.p_minus)
    g0_ = jnp.where(go_right, c.g_plus, c.g_minus)
    direction = jnp.where(go_right, 1.0, -1.0)

    # build the new subtree leaf by leaf with progressive
    # multinomial sampling and incremental U-turn checks via a
    # stored stack of subtree left endpoints
    class _S(NamedTuple):
        i: jax.Array
        q: jax.Array
        p: jax.Array
        g: jax.Array
        q_prop: jax.Array
        logp_prop: jax.Array
        g_prop: jax.Array
        log_sum_w_sub: jax.Array
        sum_p_sub: jax.Array
        stack_q: jax.Array
        stack_p: jax.Array
        stack_sum_p: jax.Array
        turning: jax.Array
        diverged: jax.Array
        sum_accept: jax.Array
        n_accept: jax.Array
        rng: jax.Array

    s = _S(
        i=jnp.zeros((), jnp.int32), q=q0_, p=p0_, g=g0_,
        q_prop=c.q_prop, logp_prop=jnp.array(-jnp.inf, c.logp_prop.dtype),
        g_prop=c.g_prop,
        log_sum_w_sub=jnp.array(-jnp.inf, qdt),
        sum_p_sub=jnp.zeros_like(p0_),
        stack_q=empty_like(c.q_prop), stack_p=empty_like(p0_),
        stack_sum_p=empty_like(p0_),
        turning=jnp.array(False), diverged=jnp.array(False),
        sum_accept=jnp.zeros((), qdt),
        n_accept=jnp.zeros((), qdt), rng=key_acc,
    )

    def leaf_cond(s: _S):
        return jnp.logical_and(
            s.i < n_steps,
            jnp.logical_and(~s.turning, ~s.diverged))

    def leaf_body(s: _S):
        rng, key_mn = jax.random.split(s.rng)
        q, p, logp, g = _leapfrog(logdensity, s.q, direction * s.p,
                                  s.g, eps, inv_mass)
        p = direction * p
        H = -logp + _kinetic(p, inv_mass)
        delta = H - H0
        # A non-finite energy error (NaN logp/grad from a failed
        # PDE solve, inf from overflow) is a divergence and must
        # act like one numerically: +inf gives this leaf zero
        # multinomial weight and zero acceptance contribution.
        # Letting NaN through instead poisons the dual-averaging
        # h_bar/log_eps_bar PERMANENTLY (observed: the round-4
        # 5x1000 exact-likelihood run froze all chains with
        # 5000/5000 divergences after warmup adapted to a NaN
        # step size).
        delta = jnp.where(jnp.isfinite(delta), delta, jnp.inf)
        diverged = delta > _MAX_DELTA
        log_w = -delta  # multinomial weight of this leaf
        accept_p = jnp.minimum(1.0, jnp.exp(-delta))

        # progressive multinomial sampling within the subtree
        new_sum = jnp.logaddexp(s.log_sum_w_sub, log_w)
        take = jnp.log(jax.random.uniform(key_mn)) < (log_w - new_sum)
        q_prop = jnp.where(take, q, s.q_prop)
        logp_prop = jnp.where(take, logp, s.logp_prop)
        g_prop = jnp.where(take, g, s.g_prop)

        sum_p_sub = s.sum_p_sub + p
        i1 = s.i + 1
        levels = jnp.arange(max_depth)
        pow2 = 2 ** levels

        # leaf i is the *start* of the aligned subtrees at every
        # level l with i % 2^l == 0: store it in those slots
        push_mask = ((s.i % pow2) == 0)[:, None]
        stack_q = jnp.where(push_mask, q[None, :], s.stack_q)
        stack_p = jnp.where(push_mask, p[None, :], s.stack_p)

        # leaf i is the *end* of the aligned subtree at level l >= 1
        # iff (i+1) % 2^l == 0: U-turn check against the stored
        # start state of each completed subtree
        def check_level(turning, l):
            complete = jnp.logical_and(l >= 1, (i1 % (2 ** l)) == 0)
            # momenta are stored in global time orientation, but the
            # stack holds generation-ordered endpoints: for a
            # backward-built subtree (direction < 0) the current leaf
            # is the time-*earlier* endpoint, so swap the arguments
            # to keep (theta-, p-, theta+, p+) in time order
            t = jnp.where(direction > 0,
                          is_turning(stack_q[l], stack_p[l], q, p),
                          is_turning(q, p, stack_q[l], stack_p[l]))
            return jnp.logical_or(turning,
                                  jnp.logical_and(complete, t)), None

        turning, _ = jax.lax.scan(check_level, s.turning, levels)

        return _S(
            i=i1, q=q, p=p, g=g, q_prop=q_prop, logp_prop=logp_prop,
            g_prop=g_prop, log_sum_w_sub=new_sum, sum_p_sub=sum_p_sub,
            stack_q=stack_q, stack_p=stack_p,
            stack_sum_p=s.stack_sum_p,
            turning=turning, diverged=jnp.logical_or(s.diverged, diverged),
            sum_accept=s.sum_accept + accept_p,
            n_accept=s.n_accept + 1.0, rng=rng,
        )

    s = jax.lax.while_loop(leaf_cond, leaf_body, s)

    # biased progressive sampling between old trajectory and subtree
    rng, key_swap = jax.random.split(rng)
    log_ratio = s.log_sum_w_sub - c.log_sum_w
    take_sub = jnp.logical_and(
        jnp.log(jax.random.uniform(key_swap)) < log_ratio,
        jnp.logical_and(~s.turning, ~s.diverged))
    q_prop = jnp.where(take_sub, s.q_prop, c.q_prop)
    logp_prop = jnp.where(take_sub, s.logp_prop, c.logp_prop)
    g_prop = jnp.where(take_sub, s.g_prop, c.g_prop)

    ok = jnp.logical_and(~s.turning, ~s.diverged)
    log_sum_w = jnp.where(ok, jnp.logaddexp(c.log_sum_w,
                                            s.log_sum_w_sub),
                          c.log_sum_w)
    sum_p = c.sum_p + jnp.where(ok, s.sum_p_sub, 0.0)

    q_minus = jnp.where(go_right, c.q_minus, s.q)
    p_minus = jnp.where(go_right, c.p_minus, s.p)
    g_minus = jnp.where(go_right, c.g_minus, s.g)
    q_plus = jnp.where(go_right, s.q, c.q_plus)
    p_plus = jnp.where(go_right, s.p, c.p_plus)
    g_plus = jnp.where(go_right, s.g, c.g_plus)

    turning_tot = jnp.logical_or(
        s.turning,
        jnp.logical_and(ok, is_turning(q_minus, p_minus, q_plus,
                                       p_plus)))

    c_new = _C(
        q_minus=q_minus, p_minus=p_minus, g_minus=g_minus,
        q_plus=q_plus, p_plus=p_plus, g_plus=g_plus,
        q_prop=q_prop, logp_prop=logp_prop, g_prop=g_prop,
        log_sum_w=log_sum_w, sum_p=sum_p,
        depth=c.depth + 1, turning=turning_tot, diverged=s.diverged,
        sum_accept=c.sum_accept + s.sum_accept,
        n_accept=c.n_accept + s.n_accept, rng=rng,
        h0=c.h0, eps=c.eps, inv_mass=c.inv_mass,
    )
    return jax.tree_util.tree_map(
        lambda new, old: jnp.where(active, new, old), c_new, c)


def _tree_finish(state: NUTSState, c: _C,
                 rng: jax.Array) -> Tuple[NUTSState, NUTSInfo]:
    accept_stat = jnp.where(c.n_accept > 0, c.sum_accept / c.n_accept, 0.0)
    new_state = state._replace(q=c.q_prop, logp=c.logp_prop, grad=c.g_prop,
                               rng=rng)
    info = NUTSInfo(accept_stat=accept_stat, diverged=c.diverged,
                    depth=c.depth, energy=-c.logp_prop)
    return new_state, info


def _nuts_step(logdensity: Callable, state: NUTSState, *,
               max_depth: int = 10) -> Tuple[NUTSState, NUTSInfo]:
    """One multinomial-NUTS transition (no adaptation)."""
    c, rng = _tree_init(state)
    c = jax.lax.while_loop(
        lambda c: _tree_cond(c, max_depth),
        lambda c: _tree_extend(logdensity, c, max_depth=max_depth), c)
    return _tree_finish(state, c, rng)


def _adapt(state: NUTSState, info: NUTSInfo, t: jax.Array, *,
           target_accept: float, gamma=0.05, t0=10.0, kappa=0.75,
           adapt_mass: bool = True) -> NUTSState:
    """Dual averaging (Hoffman & Gelman 2014) + Welford mass update."""
    tt = t.astype(state.q.dtype) + 1.0
    # defense in depth: a non-finite acceptance statistic (possible
    # only if the logdensity itself emits non-finite values that slip
    # past the leaf guard in _nuts_step) counts as "rejected
    # everything" rather than contaminating the adaptation state
    acc = jnp.where(jnp.isfinite(info.accept_stat), info.accept_stat, 0.0)
    h_bar = (1.0 - 1.0 / (tt + t0)) * state.h_bar + (
        target_accept - acc) / (tt + t0)
    log_eps = state.mu - jnp.sqrt(tt) / gamma * h_bar
    w = tt ** (-kappa)
    log_eps_bar = w * log_eps + (1.0 - w) * state.log_eps_bar

    n = state.w_count + 1
    delta = state.q - state.w_mean
    mean = state.w_mean + delta / n
    m2 = state.w_m2 + delta * (state.q - mean)

    return state._replace(step_size=jnp.exp(log_eps), h_bar=h_bar,
                          log_eps_bar=log_eps_bar,
                          w_count=n if adapt_mass else state.w_count,
                          w_mean=mean if adapt_mass else state.w_mean,
                          w_m2=m2 if adapt_mass else state.w_m2)


def _warm_update(state: NUTSState, info: NUTSInfo, t: jax.Array, *,
                 num_warmup: int, target_accept: float) -> NUTSState:
    """Post-draw warmup update: dual averaging + Welford, with the
    mass-matrix midpoint adoption at ``t == num_warmup // 2``."""
    state = _adapt(state, info, t, target_accept=target_accept)
    halfway = t == num_warmup // 2
    var = jnp.where(state.w_count > 1,
                    state.w_m2 / jnp.maximum(state.w_count - 1, 1),
                    jnp.ones_like(state.w_m2))
    return state._replace(
        inv_mass=jnp.where(halfway, var, state.inv_mass),
        # restart Welford after adopting the midpoint estimate
        w_count=jnp.where(halfway, 0, state.w_count),
        w_mean=jnp.where(halfway, 0.0, state.w_mean),
        w_m2=jnp.where(halfway, 0.0, state.w_m2),
    )


def make_host_tree_sampler(logdensity: Callable, *, max_depth: int = 10,
                           num_warmup: int = 0,
                           target_accept: float = 0.65):
    """Host-driven vmapped NUTS: one device dispatch PER TRAJECTORY
    DOUBLING instead of one program per draw/block.

    Exists for accelerator runtimes that bound single-execution wall
    time (the axon TPU runtime kills executions over ~60 s): with the
    exact PDE likelihood a leapfrog leaf is ~1 s, so a full
    max_depth=6 tree (63 leaves) in one dispatch sits AT the limit,
    while the largest single doubling (32 leaves) stays safely under
    it.  The tree logic is the same :func:`_tree_extend` the compiled
    path uses (finished chains no-op inside a doubling); the host only
    reads back three tiny flag vectors per doubling (~25 ms through
    the TPU tunnel) to decide when every chain's tree is done.

    Returns ``draw(states, warm_t=None) -> (states, info)``, vmapped
    over chains.  Pass ``warm_t`` (the warmup iteration index) during
    adaptation; ``None`` for posterior draws.
    """
    import numpy as np

    vinit = jax.jit(jax.vmap(_tree_init))
    vextend = jax.jit(jax.vmap(
        lambda c: _tree_extend(logdensity, c, max_depth=max_depth)))
    vfinish = jax.jit(jax.vmap(_tree_finish))
    vwarm = jax.jit(jax.vmap(
        lambda s, i, t: _warm_update(s, i, t, num_warmup=num_warmup,
                                     target_accept=target_accept),
        in_axes=(0, 0, None)))

    def draw(states: NUTSState, warm_t=None):
        c, rng = vinit(states)
        while True:
            depth, turning, diverged = jax.device_get(
                (c.depth, c.turning, c.diverged))
            if not np.any((depth < max_depth) & ~turning & ~diverged):
                break
            c = vextend(c)
        states, info = vfinish(states, c, rng)
        if warm_t is not None:
            states = vwarm(states, info,
                           jnp.asarray(warm_t, jnp.int32))
        return states, info

    return draw


@partial(jax.jit, static_argnames=("logdensity", "num_block", "num_warmup",
                                  "max_depth", "target_accept"))
def warmup_block(logdensity: Callable, state: NUTSState, t_start: jax.Array,
                 *, num_block: int, num_warmup: int, max_depth: int = 10,
                 target_accept: float = 0.65) -> NUTSState:
    """Run ``num_block`` adaptation steps starting at warmup index
    ``t_start`` (traced, so one compile serves every block).

    Exposes warmup in resumable pieces exactly like ``sample`` exposes
    the draw phase: a multi-hour exact-likelihood warmup
    (``workloads/fit_and_infer._run_chains_on``) checkpoints the small
    ``NUTSState`` pytree between blocks instead of risking the whole
    adaptation phase on one uninterrupted process.  The mass-matrix
    midpoint adoption fires inside whichever block contains
    ``num_warmup // 2``.  Finalization (adopting the dual-averaged
    step size) is the caller's job once ``t_start + num_block``
    reaches ``num_warmup`` — apply ``warmup_finalize`` (idempotent).
    """

    def warm_step(state, t):
        state, info = _nuts_step(logdensity, state, max_depth=max_depth)
        state = _warm_update(state, info, t, num_warmup=num_warmup,
                             target_accept=target_accept)
        return state, None

    ts = jnp.asarray(t_start, jnp.int32) + jnp.arange(num_block,
                                                      dtype=jnp.int32)
    state, _ = jax.lax.scan(warm_step, state, ts)
    return state


def warmup_finalize(state: NUTSState) -> NUTSState:
    """Adopt the dual-averaged step size after the last warmup block
    (idempotent: ``log_eps_bar`` is untouched, so re-applying after a
    resume is harmless)."""
    return state._replace(step_size=jnp.exp(state.log_eps_bar))


def warmup(logdensity: Callable, q0: jax.Array, rng: jax.Array, *,
           num_warmup: int = 500, max_depth: int = 10,
           target_accept: float = 0.65,
           init_step_size: float = 0.1) -> NUTSState:
    """Adaptation phase: dual-averaged step size + diagonal mass matrix
    (Welford estimate adopted at the warmup midpoint).  Returns the
    ready-to-sample chain state.  One-shot wrapper over
    ``warmup_block`` + ``warmup_finalize``."""
    state = init(logdensity, q0, rng, step_size=init_step_size)
    state = warmup_block(logdensity, state, 0, num_block=num_warmup,
                         num_warmup=num_warmup, max_depth=max_depth,
                         target_accept=target_accept)
    return warmup_finalize(state)


@partial(jax.jit, static_argnames=("logdensity", "num_samples", "max_depth"))
def sample(logdensity: Callable, state: NUTSState, *,
           num_samples: int = 100, max_depth: int = 10):
    """Draw a block of samples from a warmed-up state.

    Returns ``(state, qs, info)``; call repeatedly (checkpointing the
    small ``NUTSState`` pytree between blocks) for resumable long runs.
    """

    def draw(state, _):
        state, info = _nuts_step(logdensity, state, max_depth=max_depth)
        return state, (state.q, info.accept_stat, info.diverged,
                       info.depth, state.logp)

    state, (qs, acc, div, depth, logp) = jax.lax.scan(
        draw, state, None, length=num_samples)
    return state, qs, {"accept_stat": acc, "diverged": div, "depth": depth,
                       "logp": logp}


def run_nuts(logdensity: Callable, q0: jax.Array, rng: jax.Array, *,
             num_warmup: int = 500, num_samples: int = 1000,
             max_depth: int = 10, target_accept: float = 0.65,
             init_step_size: float = 0.1):
    """Run one NUTS chain; vmap over (q0, rng) for multiple chains.

    Returns ``(samples (num_samples, d), info)`` with per-draw
    acceptance statistics, divergences, depths, and log densities.
    ``warmup`` + ``sample`` expose the same run in resumable stages.
    """
    state = warmup(logdensity, q0, rng, num_warmup=num_warmup,
                   max_depth=max_depth, target_accept=target_accept,
                   init_step_size=init_step_size)
    state, qs, info = sample(logdensity, state, num_samples=num_samples,
                             max_depth=max_depth)
    info = dict(info)
    info["step_size"] = state.step_size
    info["inv_mass"] = state.inv_mass
    return qs, info
