"""Double-f32 (error-free-transform) arithmetic for TPU.

TPU v5e has no native f64 ALU; XLA emulates f64 in software.  For
configs whose cost is dominated by emulated-f64 *elementwise* work
(the north-star RHS: 58% of the f64 step, scripts/
profile_step_components.py), an alternative is to carry values as an
unevaluated f32 pair ``hi + lo`` (|lo| <= ulp(hi)/2) and compute with
compensated primitives:

  * ``two_sum``   (Knuth): exact a+b = s + e in 6 f32 ops
  * ``two_prod``  (Dekker split, no FMA dependence): exact a*b = p + e
    in 17 f32 ops — Mosaic/XLA:TPU exposes no guaranteed-fused FMA
    primitive, so the 4-way split product is used
  * df32 +, -, *, / built on those (~20 f32 ops each)

Effective precision ~2^-48 relative (measured 3e-14 on the model RHS,
tests/test_df32.py) — far beyond the ~1e-7 floor of the jvp-split
``rhs_mixed`` scheme (whose f32 rounding of f(y_hi) is unrecoverable;
see the dead-end note in ``solve_stiff_batch``), and enough for the
rtol 1e-6 north star.

Whether this WINS depends on where the RHS sits on the roofline: df32
is ~10x the f32 op count but half the f64 memory traffic; the measured
f64/f32 RHS ratio is only 2.5x (77 us vs 31 us per eval at B=256), so
the emulation overhead is partly hidden by bandwidth.  See
``scripts/bench_df32_rhs.py`` for the measurement this was built for
(VERDICT-r4 item 6).

Reference for the algorithms: Dekker (1971), Knuth TAOCP v2, and the
double-double literature (Hida-Li-Bailey); implementation is original.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

F32 = jnp.float32


class DF32(NamedTuple):
    """An unevaluated f32 sum ``hi + lo``; elementwise array semantics."""
    hi: jax.Array
    lo: jax.Array

    # -- arithmetic (operator sugar used by the generic reaction loop)
    def __add__(self, o):
        return add(self, _lift(o))

    def __radd__(self, o):
        return add(_lift(o), self)

    def __sub__(self, o):
        return sub(self, _lift(o))

    def __rsub__(self, o):
        return sub(_lift(o), self)

    def __mul__(self, o):
        return mul(self, _lift(o))

    def __rmul__(self, o):
        return mul(_lift(o), self)

    def __truediv__(self, o):
        return div(self, _lift(o))

    def __rtruediv__(self, o):
        return div(_lift(o), self)

    def __neg__(self):
        return DF32(-self.hi, -self.lo)

    def __pow__(self, n):
        assert isinstance(n, int) and n >= 1
        out = self
        for _ in range(n - 1):
            out = mul(out, self)
        return out

    # -- array plumbing (shape ops apply to both halves)
    def __getitem__(self, idx):
        return DF32(self.hi[idx], self.lo[idx])

    @property
    def T(self):
        return DF32(self.hi.T, self.lo.T)

    @property
    def shape(self):
        return self.hi.shape

    @property
    def dtype(self):
        return self.hi.dtype


def _lift(x) -> DF32:
    if isinstance(x, DF32):
        return x
    x = jnp.asarray(x)
    if x.dtype == jnp.float64:
        return from_f64(x)
    x = x.astype(F32)
    return DF32(x, jnp.zeros_like(x))


def from_f64(x: jax.Array) -> DF32:
    """Split an f64 array into an exact f32 hi + f32 lo pair."""
    hi = x.astype(F32)
    lo = (x - hi.astype(x.dtype)).astype(F32)
    return DF32(hi, lo)


def to_f64(a: DF32) -> jax.Array:
    return a.hi.astype(jnp.float64) + a.lo.astype(jnp.float64)


def two_sum(a, b):
    """Exact a + b = s + e (Knuth; no magnitude ordering assumed)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Exact a + b = s + e, REQUIRES |a| >= |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


_SPLITTER = F32(4097.0)  # 2^12 + 1 for f32 (24-bit significand)


def _split(a):
    """Dekker split: a = a_hi + a_lo with 12-bit halves (exact)."""
    t = _SPLITTER * a
    a_hi = t - (t - a)
    return a_hi, a - a_hi


def two_prod(a, b):
    """Exact a * b = p + e without relying on a fused multiply-add
    (XLA:TPU guarantees none for f32)."""
    p = a * b
    a_hi, a_lo = _split(a)
    b_hi, b_lo = _split(b)
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def add(a: DF32, b: DF32) -> DF32:
    """Double-f32 addition, accurate variant (AccurateDWPlusDW,
    Joldes-Muller-Popescu 2017: relative error ~3u^2 even under full
    cancellation — the sloppy one-two_sum form measured 1.6e-12 on
    cancelling sums, tests/test_df32.py)."""
    s, e = two_sum(a.hi, b.hi)
    t, f = two_sum(a.lo, b.lo)
    s, e = fast_two_sum(s, e + t)
    return DF32(*fast_two_sum(s, e + f))


def sub(a: DF32, b: DF32) -> DF32:
    return add(a, DF32(-b.hi, -b.lo))


def mul(a: DF32, b: DF32) -> DF32:
    p, e = two_prod(a.hi, b.hi)
    e = e + (a.hi * b.lo + a.lo * b.hi)
    return DF32(*fast_two_sum(p, e))


def div(a: DF32, b: DF32) -> DF32:
    """Double-f32 division by one Newton-corrected long division:
    q0 = a_hi/b_hi, remainder r = a - q0*b evaluated in df32,
    q1 = r_hi/b_hi.  ~1 ulp(df32)."""
    q0 = a.hi / b.hi
    r = sub(a, mul(DF32(q0, jnp.zeros_like(q0)), b))
    q1 = (r.hi + r.lo) / b.hi
    return DF32(*fast_two_sum(q0, q1))


# -- array helpers (apply a jnp shape op to both halves) -------------------

def stack(xs, axis=0) -> DF32:
    return DF32(jnp.stack([x.hi for x in xs], axis=axis),
                jnp.stack([x.lo for x in xs], axis=axis))


def concatenate(xs, axis=0) -> DF32:
    return DF32(jnp.concatenate([x.hi for x in xs], axis=axis),
                jnp.concatenate([x.lo for x in xs], axis=axis))


def moveaxis(a: DF32, s, d) -> DF32:
    return DF32(jnp.moveaxis(a.hi, s, d), jnp.moveaxis(a.lo, s, d))


def where(c, a: DF32, b: DF32) -> DF32:
    return DF32(jnp.where(c, a.hi, b.hi), jnp.where(c, a.lo, b.lo))


def zeros_like(a: DF32) -> DF32:
    return DF32(jnp.zeros_like(a.hi), jnp.zeros_like(a.lo))
