"""Tracing / timing instrumentation (SURVEY.md §5 tracing plan).

The reference has no profiling story beyond tqdm bars (``train.py:64,82``).
Here: ``maybe_trace`` wraps a scope in a ``jax.profiler`` trace (viewable in
TensorBoard/Perfetto) when a directory is given, and ``timed`` measures
steady-state wall time of a device computation with ``block_until_ready``.
The train CLI exposes this via ``--profile_dir``.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]):
    """Profile the enclosed scope into ``trace_dir`` if set, else no-op."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, warmup: int = 2, iters: int = 10) -> dict:
    """Steady-state timing of ``fn()`` (must return jax arrays)."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn())
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "iters": iters}
