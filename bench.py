#!/usr/bin/env python
"""Headline benchmark: full analytics pipeline points/s on one TPU chip.

Protocol (BASELINE.md — the reference publishes no numbers, so the baseline
is the measured CPU reference path):
  - TPU:   full jitted pipeline (preprocess -> clustering -> density ->
           flow -> bottlenecks) on a 1M-point synthetic venue, steady-state.
  - CPU:   the faithful NumPy/sklearn oracle on a 100K-point venue of the
           same recipe (the CPU path is O(n log n)+ and would take minutes
           at 1M; measuring at 100K and using its points/s is *generous* to
           the CPU baseline since its per-point cost grows with n).
  - vs_baseline = tpu_points_per_sec / cpu_points_per_sec.

Also asserts correctness alongside speed: density-grid MAE vs the oracle on
the 100K venue must be ~0 (exact radius-count parity).

Prints exactly one JSON line.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    from lidar_ai_recommendation_software_tpu.config import MONOLITH_CONFIG
    from lidar_ai_recommendation_software_tpu.pipeline import Pipeline
    from lidar_ai_recommendation_software_tpu.synthetic import scaled_venue
    from lidar_ai_recommendation_software_tpu.types import PointCloud

    n_tpu = int(os.environ.get("LIDAR_BENCH_POINTS", 1_000_000))
    n_cpu = 100_000

    pts_small = scaled_venue(n_cpu)
    pts_big = scaled_venue(n_tpu)

    # ---- CPU reference baseline (measured) ----
    from lidar_ai_recommendation_software_tpu.oracle import reference as ref
    t0 = time.time()
    oracle_small = ref.analyze(pts_small, variant="monolith")
    cpu_s = time.time() - t0
    cpu_pps = n_cpu / cpu_s

    # ---- device liveness guard (remote tunnels can wedge; emit an
    # honest degraded record instead of hanging the driver) ----
    from lidar_ai_recommendation_software_tpu.utils.resilience import (
        device_healthy)
    # explicit attempts/delay: worst case 3x120s + 2x5s before declaring
    # the chip down — intentional here (the driver runs bench once per
    # round; a transient tunnel error must not zero the record)
    if not device_healthy(timeout_s=120.0, attempts=3, retry_delay_s=5.0):
        print(json.dumps({
            "metric": "full_pipeline_points_per_sec_1chip",
            "value": 0, "unit": "points/s", "vs_baseline": 0.0,
            "detail": {"error": "device unhealthy (liveness probe "
                                "timed out)",
                       "cpu_points_per_sec": round(cpu_pps)},
        }))
        return

    # ---- TPU pipeline ----
    pipe = Pipeline(MONOLITH_CONFIG)

    # correctness at 100K vs oracle
    out_small = pipe.analyze(pts_small)
    g = out_small["density"]["density_grid"]
    og = oracle_small["density"]["density_grid"]
    mae = float(np.abs(g - og).mean()) if g.shape == og.shape else float("nan")
    people_ok = (out_small["density"]["total_people"]
                 == oracle_small["density"]["total_people"])

    # Steady-state timing on device. Distinct input clouds per call
    # and a value pull at the end: through the remote-device tunnel,
    # block_until_ready returns at enqueue time, so only a host read of
    # the final result gives honest wall-clock (device execution
    # serialises, so the pull fences the whole run).
    def measure(pts, iters):
        cfg = pipe.fit_capacity(pts)
        clouds = [PointCloud.from_numpy(pts + i * 1e-4,
                                        cfg.capacity.max_points)
                  for i in range(iters)]
        r = pipe.analyze_device(clouds[0], cfg)
        _ = float(r[2].density.max_density)  # warmup + fence
        t0 = time.time()
        for c in clouds:
            r = pipe.analyze_device(c, cfg)
        _ = float(r[2].density.max_density)
        sec = (time.time() - t0) / iters
        return len(pts) / sec, sec

    tpu_pps, tpu_s = measure(pts_big, iters=4)

    # venue-scale tail (BASELINE configs 4-5 name 1M AND 10M+ scans);
    # skipped when the headline size was overridden or on request
    detail_10m = {}
    if (n_tpu == 1_000_000
            and os.environ.get("LIDAR_BENCH_10M", "1") == "1"):
        pts_10m = scaled_venue(10_000_000)
        pps_10m, s_10m = measure(pts_10m, iters=2)
        detail_10m = {"points_per_sec_10m": round(pps_10m),
                      "step_ms_10m": round(s_10m * 1000, 1)}

    # fused SA layer (BASELINE.json north star: FPS + ball query + SA
    # kernels); guarded so a kernel regression degrades the record, not
    # the headline
    if os.environ.get("LIDAR_BENCH_SA", "1") == "1":
        try:
            import jax.numpy as jnp

            from lidar_ai_recommendation_software_tpu.ops.grouping import (
                ball_group, group_features)
            from lidar_ai_recommendation_software_tpu.ops.pallas import (
                kernels as pk)
            from lidar_ai_recommendation_software_tpu.utils.profiling \
                import device_timer

            n_sa, m_sa, k_sa = 100_000, 4096, 32
            sa_pts = jnp.asarray(pts_small[:n_sa], jnp.float32)
            sa_mask = jnp.ones(n_sa, bool)
            rng = np.random.RandomState(0)
            dims = [3, 32, 32, 64]
            w = [(jnp.asarray(rng.randn(a, b) * 0.1, jnp.float32),
                  jnp.zeros(b, jnp.float32))
                 for a, b in zip(dims[:-1], dims[1:])]

            def sa(p):
                idx = pk.fps(p, sa_mask, m_sa)
                cents = p[idx]
                gidx, gvalid = ball_group(cents, sa_mask[idx], p,
                                          sa_mask, 0.6, k_sa)
                g = group_features(p, None, cents, gidx, gvalid)
                return pk.sa_mlp_pool(g, gvalid, w,
                                      compute_dtype=jnp.bfloat16)

            import jax
            f = jax.jit(sa)
            sec = device_timer(f, lambda i: (sa_pts + i * 1e-4,),
                               lambda r: r[0, 0], iters=2)
            detail_10m["sa_layer_fused_ms"] = round(sec * 1000, 2)
            detail_10m["sa_layer_points_per_sec"] = round(n_sa / sec)
        except Exception as e:  # record, don't fail the headline
            detail_10m["sa_layer_error"] = str(e)[:200]

    result = {
        "metric": "full_pipeline_points_per_sec_1chip",
        "value": round(tpu_pps),
        "unit": "points/s",
        "vs_baseline": round(tpu_pps / cpu_pps, 2),
        "detail": {
            "tpu_step_ms": round(tpu_s * 1000, 2),
            "tpu_points": n_tpu,
            "cpu_points_per_sec": round(cpu_pps),
            "cpu_points": n_cpu,
            "density_mae_vs_oracle_100k": mae,
            "people_parity_100k": bool(people_ok),
            "device": str(jax.devices()[0]),
            **detail_10m,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
