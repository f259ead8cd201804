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


# ---------------------------------------------------------------------------
# Roofline accounting
# ---------------------------------------------------------------------------

# Public per-chip peak numbers, keyed by substring of
# ``jax.Device.device_kind`` (e.g. "TPU v5 lite"). bf16 MXU FLOPs and HBM
# bandwidth; f32 matmul peak is ~half the bf16 number on all listed parts.
DEVICE_PEAKS = {
    "v5 lite": {"chip": "v5e", "bf16_tflops": 197.0, "hbm_gbps": 819.0},
    "v5e": {"chip": "v5e", "bf16_tflops": 197.0, "hbm_gbps": 819.0},
    "v5p": {"chip": "v5p", "bf16_tflops": 459.0, "hbm_gbps": 2765.0},
    "v6": {"chip": "v6e", "bf16_tflops": 918.0, "hbm_gbps": 1640.0},
    "v4": {"chip": "v4", "bf16_tflops": 275.0, "hbm_gbps": 1228.0},
    "v3": {"chip": "v3", "bf16_tflops": 123.0, "hbm_gbps": 900.0},
    "v2": {"chip": "v2", "bf16_tflops": 45.0, "hbm_gbps": 700.0},
}


def device_peaks(device=None) -> Optional[Dict[str, float]]:
    """Peak FLOPs/bandwidth for ``device`` (default: first jax device)."""
    import jax
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "") or ""
    for key, peaks in DEVICE_PEAKS.items():
        if key in kind.lower():
            return dict(peaks)
    return None


def roofline(flops: float, bytes_accessed: float, seconds: float,
             device=None) -> Dict[str, float]:
    """Achieved vs peak for one timed kernel/program.

    Returns achieved TFLOP/s and GB/s plus percent-of-peak numbers and
    which roof binds (higher fraction of its peak). Percentages are vs
    the bf16 MXU peak — the speed-of-light target for this framework's
    kernels; halve mentally for a pure-f32 program."""
    out = {
        "achieved_tflops": flops / seconds / 1e12,
        "achieved_gbps": bytes_accessed / seconds / 1e9,
    }
    peaks = device_peaks(device)
    if peaks:
        out["chip"] = peaks["chip"]
        out["pct_peak_flops"] = 100.0 * out["achieved_tflops"] / \
            peaks["bf16_tflops"]
        out["pct_peak_bw"] = 100.0 * out["achieved_gbps"] / \
            peaks["hbm_gbps"]
        out["bound"] = ("compute" if out["pct_peak_flops"]
                        >= out["pct_peak_bw"] else "memory")
    return out


def pipeline_stage_costs(n_points: int, n_people: int,
                         table_slots: int, column_cap: int, pyp: int,
                         grid_cells: int, bucket_cap: int,
                         gs_groups: int = 2) -> Dict[str, Dict[str, float]]:
    """Modeled MINIMUM work for the dominant pipeline stages: FLOPs that
    must execute and HBM bytes that must move (each logical array read
    once / written once per macro-op; sorts counted as one read + one
    write per lane — a lower bound, real sorts make log passes).
    Feeding these + a measured time into ``roofline`` yields a LOWER
    bound on achieved fraction of speed-of-light — honest for "how far
    from the roof", optimistic never.

    Terms (S = table_slots = PX*CAP*PYP, n = points, k = people cap):
      clustering  build sort (5 lanes rw) + fill-kernel stream read +
                  5 planes written + counts (3 planes read, 1 written) +
                  gs_groups pass groups (3 coord planes + labels rw,
                  x and y orientations + label transposes) + extract
                  (labels read + stream) + unsort (2 lanes rw);
                  FLOPs: fill/extract dispatch matmuls (2*5CAP*PYP and
                  2*CAP*PYP per point) + 9-neighborhood distance tests
                  (8 flops each, CAP candidates per slot).
      extract_people  4-lane sort rw + compensated prefix (~20 flops/pt)
                  + pack sort (8 lanes rw).
      density     bucketed radius count: 9*bucket_cap tests per cell,
                  8 flops each; people read + grid written.
    """
    n, k, S = float(n_points), float(n_people), float(table_slots)
    cells = float(grid_cells)
    cap = float(column_cap)
    f32 = 4.0
    sort5 = 2 * 5 * f32 * n
    fill_read = 7 * f32 * n
    planes_w = 5 * f32 * S
    counts = (3 + 1) * f32 * S
    per_group = 2 * (3 * f32 * S + 2 * f32 * S) * 2 + 2 * 2 * f32 * S
    extract = f32 * S + 3 * f32 * n + f32 * n
    unsort = 2 * 2 * f32 * n
    clustering_bytes = (3 * f32 * n + sort5 + fill_read + planes_w
                        + counts + gs_groups * per_group + extract
                        + unsort)
    clustering_flops = (2 * 5 * cap * pyp * n          # fill matmul
                        + 2 * cap * pyp * n            # extract matmul
                        + (1 + 2 * gs_groups * 2) * 9 * cap * 8 * S)

    people_bytes = (2 * 4 * f32 * n) + (2 * 8 * f32 * n) + 20 * f32 * k
    people_flops = 20 * n

    density_bytes = 2 * f32 * k + f32 * cells + 9 * bucket_cap * 0.0
    density_flops = 9 * bucket_cap * 8 * cells

    return {
        "clustering": {"flops": clustering_flops,
                       "bytes": clustering_bytes},
        "extract_people": {"flops": people_flops, "bytes": people_bytes},
        "density": {"flops": density_flops, "bytes": density_bytes},
    }
