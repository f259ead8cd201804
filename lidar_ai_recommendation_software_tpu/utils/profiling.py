"""Tracing / timing / observability.

The reference has no profiling at all (SURVEY.md §5 — only st.spinner
UX wrappers). This module provides:

  - ``stage``: a context manager that records wall time per pipeline
    stage and optionally emits a ``jax.profiler`` trace annotation so
    stages show up named in TPU traces;
  - ``device_timer``: honest steady-state timing of a jitted function on
    a (possibly remote) device — distinct inputs per call and a value
    pull as the fence, because through tunneled devices
    ``block_until_ready`` can return at enqueue time;
  - ``trace``: wrapper around jax.profiler.trace for capturing a
    TensorBoard-loadable trace directory;
  - a process-wide stage-timing registry (``timings``, ``report``).
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Callable, Dict, List, Optional

import numpy as np

logger = logging.getLogger("lidar_tpu")

_TIMINGS: Dict[str, List[float]] = defaultdict(list)


@contextlib.contextmanager
def stage(name: str, annotate: bool = True):
    """Time a pipeline stage; nests with jax profiler traces."""
    ctx = contextlib.nullcontext()
    if annotate:
        try:
            import jax.profiler
            ctx = jax.profiler.TraceAnnotation(name)
        except Exception:
            pass
    t0 = time.perf_counter()
    with ctx:
        yield
    dt = time.perf_counter() - t0
    _TIMINGS[name].append(dt)
    logger.debug("stage %s: %.1f ms", name, dt * 1000)


def timings() -> Dict[str, Dict[str, float]]:
    out = {}
    for name, vals in _TIMINGS.items():
        arr = np.asarray(vals)
        out[name] = {"count": len(vals), "total_s": float(arr.sum()),
                     "mean_ms": float(arr.mean() * 1000),
                     "last_ms": float(arr[-1] * 1000)}
    return out


def reset_timings() -> None:
    _TIMINGS.clear()


def report() -> str:
    lines = [f"{'stage':<32} {'count':>5} {'mean ms':>10} {'total s':>9}"]
    for name, s in sorted(timings().items()):
        lines.append(f"{name:<32} {s['count']:>5} {s['mean_ms']:>10.2f} "
                     f"{s['total_s']:>9.2f}")
    return "\n".join(lines)


def device_timer(fn: Callable, make_input: Callable[[int], tuple],
                 pull: Callable, iters: int = 4,
                 warmup: int = 1) -> float:
    """Honest per-call seconds for a jitted ``fn``.

    make_input(i) -> args tuple (distinct per call, defeating any
    dispatch-level caching); pull(result) -> small value forcing
    execution (a host read fences the serialized device queue)."""
    for i in range(warmup):
        r = fn(*make_input(i))
        np.asarray(pull(r))
    t0 = time.perf_counter()
    for i in range(iters):
        r = fn(*make_input(warmup + i))
    np.asarray(pull(r))
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a TPU/HLO profile into ``logdir`` (TensorBoard format)."""
    import jax.profiler
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
