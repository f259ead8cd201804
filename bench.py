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
import sys
import time

import numpy as np


def main():
    import jax

    from lidar_ai_recommendation_software_tpu.config import MONOLITH_CONFIG
    from lidar_ai_recommendation_software_tpu.pipeline import Pipeline
    from lidar_ai_recommendation_software_tpu.synthetic import scaled_venue
    from lidar_ai_recommendation_software_tpu.types import PointCloud

    n_tpu = 1_000_000
    n_cpu = 100_000

    pts_small = scaled_venue(n_cpu)
    pts_big = scaled_venue(n_tpu)

    # ---- CPU reference baseline (measured) ----
    from lidar_ai_recommendation_software_tpu.oracle import reference as ref
    t0 = time.time()
    oracle_small = ref.analyze(pts_small, variant="monolith")
    cpu_s = time.time() - t0
    cpu_pps = n_cpu / cpu_s

    # ---- TPU pipeline ----
    pipe = Pipeline(MONOLITH_CONFIG)

    # correctness at 100K vs oracle
    out_small = pipe.analyze(pts_small)
    g = out_small["density"]["density_grid"]
    og = oracle_small["density"]["density_grid"]
    mae = float(np.abs(g - og).mean()) if g.shape == og.shape else float("nan")
    people_ok = (out_small["density"]["total_people"]
                 == oracle_small["density"]["total_people"])

    # steady-state timing at 1M on device (jit static shapes; two different
    # clouds alternate so no caching layer can elide work)
    cfg = pipe.fit_capacity(pts_big)
    cloud_a = PointCloud.from_numpy(pts_big, cfg.capacity.max_points)
    pts_b = pts_big + np.array([0.01, -0.01, 0.0])
    cloud_b = PointCloud.from_numpy(pts_b, cfg.capacity.max_points)

    r = pipe.analyze_device(cloud_a, cfg)
    jax.block_until_ready(r)
    iters = 6
    t0 = time.time()
    for i in range(iters):
        r = pipe.analyze_device(cloud_a if i % 2 == 0 else cloud_b, cfg)
    jax.block_until_ready(r)
    tpu_s = (time.time() - t0) / iters
    tpu_pps = n_tpu / tpu_s

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
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
