"""Wall timers and profiling helpers (SURVEY.md §5.1).

The reference has no tracing at all; here every phase can be bracketed with
``device_timer`` (``block_until_ready``-accurate) and, on real TPU,
``jax.profiler`` trace annotations for xprof.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


@contextlib.contextmanager
def device_timer(results: dict, key: str):
    """Accurate device timing: synchronises before and after."""
    (jax.device_put(0.0) + 0).block_until_ready()
    t0 = time.perf_counter()
    yield
    (jax.device_put(0.0) + 0).block_until_ready()
    results[key] = results.get(key, 0.0) + time.perf_counter() - t0


def median_ms(fn: Callable, *args, iters: int = 20, warmup: int = 2) -> float:
    """Median wall-clock of ``fn(*args)`` with output synchronisation."""
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return 1000.0 * float(np.median(ts))


def trace_annotation(name: str):
    """jax.profiler trace context (no-op off-TPU if profiler unavailable)."""
    try:
        return jax.profiler.TraceAnnotation(name)
    except Exception:  # pragma: no cover
        return contextlib.nullcontext()
