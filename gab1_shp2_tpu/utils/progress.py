"""Progress reporting and lightweight profiling.

The reference instruments with ``ProgressMeter`` bars and interactive
``@time`` macros (``get_param_posteriors.jl:143``,
``run_base_model.jl:83``).  Here: a chunk-loop progress printer for the
host-side driver loops (the device-side work is opaque while a batch
runs) and timer/trace helpers wrapping ``jax.profiler``.
"""

from __future__ import annotations

import contextlib
import sys
import time
from typing import Iterable, Iterator, Optional, TypeVar

import jax

T = TypeVar("T")


def progress(it: Iterable[T], total: Optional[int] = None,
             desc: str = "", every: float = 2.0) -> Iterator[T]:
    """Wrap an iterable with a rate/ETA line on stderr."""
    if total is None:
        try:
            total = len(it)  # type: ignore[arg-type]
        except TypeError:
            total = None
    t0 = time.time()
    last = 0.0
    for i, item in enumerate(it):
        yield item
        now = time.time()
        if now - last >= every or (total and i + 1 == total):
            rate = (i + 1) / max(now - t0, 1e-9)
            eta = ((total - i - 1) / rate) if (total and rate > 0) else None
            msg = f"\r{desc} {i + 1}"
            if total:
                msg += f"/{total}"
            msg += f" ({rate:.2f}/s"
            if eta is not None:
                msg += f", eta {eta:.0f}s"
            msg += ")"
            print(msg, end="", file=sys.stderr, flush=True)
            last = now
    print(file=sys.stderr)


@contextlib.contextmanager
def timer(label: str):
    """``with timer("solve"): ...`` — blocks on async dispatch so the
    reported time is real device wall-clock."""
    t0 = time.time()
    yield
    try:
        jax.effects_barrier()
    except Exception:
        pass
    print(f"[{label}] {time.time() - t0:.3f}s", file=sys.stderr)


@contextlib.contextmanager
def trace(dirname: str = "/tmp/jax-trace"):
    """Capture a ``jax.profiler`` trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(dirname)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
