"""Failure detection and graceful degradation.

The reference's only failure handling is logged-error-and-return-None
around DB calls (SURVEY.md §5). A TPU deployment needs more: remote
accelerators disappear, compiles fail, tunnels wedge. This module
provides:

  - ``device_healthy``: a bounded-time liveness probe (tiny matmul with a
    host read-back, executed in a watchdog thread so a wedged device
    cannot hang the caller);
  - ``retry``: exponential-backoff retry for transient device errors;
  - ``FallbackPipeline``: runs the TPU pipeline, and on device failure
    transparently degrades to the CPU oracle (oracle/reference.py) —
    which produces the *same results* (bit-parity is what the test suite
    asserts), so callers keep working through an outage at CPU speed.
"""

from __future__ import annotations

import logging
import threading
import time
from typing import Callable, Dict, Optional

import numpy as np

logger = logging.getLogger("lidar_tpu.resilience")


def _default_probe():
    import jax.numpy as jnp
    x = jnp.ones((128, 128))
    return float(jnp.sum(x @ x))


def device_healthy(timeout_s: float = 10.0, attempts: int = 3,
                   retry_delay_s: float = 5.0, probe=None) -> bool:
    """True when the default device executes + returns within budget.

    Remote-device tunnels surface *transient* INTERNAL errors (observed:
    a probe fails with "TPU backend error (Internal)" and the very next
    one succeeds), so a single failed probe must not condemn the device:
    retry up to ``attempts`` times with a flat delay. A probe that *hangs*
    (timeout) still counts as one failed attempt — the per-attempt budget
    is ``timeout_s``.
    """
    if probe is None:
        probe = _default_probe

    for i in range(attempts):
        # A plain daemon thread, NOT ThreadPoolExecutor: pool workers are
        # non-daemon, so a probe wedged inside a device call would block
        # interpreter exit — the caller would print its degraded record
        # and then hang until killed from outside (observed with a downed
        # axon tunnel). A daemon thread lets the process exit cleanly.
        box: Dict[str, object] = {}

        def run():
            try:
                # coerce + finiteness-check INSIDE the guarded worker: a
                # custom probe returning a non-numeric value must read as
                # an unhealthy probe, not a TypeError out of the caller
                box["val"] = float(probe())
                box["ok"] = bool(np.isfinite(box["val"]))
            except Exception as e:  # runtime error, no device
                box["err"] = e

        t = threading.Thread(target=run, daemon=True)
        t.start()
        t.join(timeout=timeout_s)
        if box.get("ok"):
            return True
        if t.is_alive():
            logger.warning("device health probe timed out "
                           "(attempt %d/%d, %.0fs)", i + 1, attempts,
                           timeout_s)
        else:
            # %r, not %s: exceptions raised with empty messages (observed
            # from the axon tunnel) must still log their class
            logger.warning("device health probe failed (attempt %d/%d):"
                           " %r", i + 1, attempts,
                           box.get("err", box.get("val")))
        if i + 1 < attempts:
            time.sleep(retry_delay_s)
    return False


def retry(fn: Callable, attempts: int = 3, base_delay_s: float = 1.0,
          retryable=(Exception,)):
    """Call ``fn`` with exponential backoff on retryable errors."""
    last = None
    for i in range(attempts):
        try:
            return fn()
        except retryable as e:
            last = e
            delay = base_delay_s * (2 ** i)
            logger.warning("attempt %d/%d failed (%r); retrying in %.1fs",
                           i + 1, attempts, e, delay)
            time.sleep(delay)
    raise last


class FallbackPipeline:
    """Pipeline wrapper that degrades to the CPU oracle on device
    failure. The oracle reimplements the reference algorithms exactly
    (the golden tests assert parity), so results stay consistent."""

    def __init__(self, pipeline=None, health_timeout_s: float = 20.0,
                 probe_first: bool = False):
        from lidar_ai_recommendation_software_tpu.pipeline import Pipeline
        self.pipeline = pipeline or Pipeline()
        self.health_timeout_s = health_timeout_s
        self.probe_first = probe_first
        self.fallbacks = 0

    def analyze(self, points: np.ndarray) -> Dict:
        # attempts=1: the probe gates a *fast failover* to the CPU oracle —
        # retrying transients here would delay degraded-mode results by
        # minutes (retries belong to callers that must not give up, like
        # bench.py's driver guard)
        if self.probe_first and not device_healthy(self.health_timeout_s,
                                                   attempts=1):
            return self._analyze_oracle(points)
        try:
            return self.pipeline.analyze(points)
        except Exception as e:
            logger.error("device pipeline failed (%s); "
                         "falling back to CPU oracle", e)
            return self._analyze_oracle(points)

    def _analyze_oracle(self, points: np.ndarray) -> Dict:
        from lidar_ai_recommendation_software_tpu.oracle import (
            reference as ref)
        from lidar_ai_recommendation_software_tpu.utils.recommendations \
            import generate_recommendations

        self.fallbacks += 1
        variant = self.pipeline.config.preprocess.variant
        out = ref.analyze(np.asarray(points, np.float64), variant=variant)
        density = out["density"]
        # normalise the oracle's monolith key to the pipeline's layout
        if "density_grid" not in density and "density_map" in density:
            density["density_grid"] = density["density_map"]
        recommendations = generate_recommendations(
            density, out["flow"], self.pipeline.config.recommend)
        return {
            "processed": out["processed"],
            "people": None,
            "coordinate_offset": np.zeros(3),
            "density": density,
            "flow": out["flow"],
            "recommendations": recommendations,
            "degraded": True,
        }
