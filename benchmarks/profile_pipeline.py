#!/usr/bin/env python
"""Incremental stage profiler for the full pipeline at large n.

Times nested prefixes of the device program (stats+ground -> +clustering ->
+density -> full) so per-stage cost falls out of differences with only four
compiles (all sharing the persistent compilation cache).

Usage: python benchmarks/profile_pipeline.py [--points 1000000] [--iters 2]
"""

from __future__ import annotations

import argparse
import functools
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lidar_ai_recommendation_software_tpu import preprocess as pp
    from lidar_ai_recommendation_software_tpu.config import PipelineConfig
    from lidar_ai_recommendation_software_tpu.models import (
        density as dm, flow as fm)
    from lidar_ai_recommendation_software_tpu.ops import clustering
    from lidar_ai_recommendation_software_tpu.pipeline import (
        Pipeline, analyze_cloud)
    from lidar_ai_recommendation_software_tpu.synthetic import scaled_venue
    from lidar_ai_recommendation_software_tpu.types import PointCloud
    from lidar_ai_recommendation_software_tpu.utils.profiling import (
        device_timer)

    n = args.points
    pts = scaled_venue(n)
    pipe = Pipeline()
    cfg = pipe.fit_capacity(pts)
    cap = cfg.capacity.max_points
    clouds = [PointCloud.from_numpy(pts + i * 1e-4, cap)
              for i in range(args.iters + 1)]
    uni = pipe._uniforms

    @functools.partial(jax.jit, static_argnames=("config",))
    def stage_stats(cloud, config: PipelineConfig):
        """Preprocess minus clustering: stats, ground split, plane."""
        pc = config.preprocess
        p, mask = cloud.points, cloud.mask
        mean = pp._masked_mean(p, mask)
        std = pp._masked_std(p, mask)
        inlier = mask & jnp.all(
            jnp.abs(p - mean) < pc.outlier_sigma * std, axis=1)
        z_thresh = pp.masked_percentile(p[:, 2], inlier,
                                        pc.ground_percentile)
        ground = inlier & (p[:, 2] <= z_thresh)
        plane = pp.fit_ground_plane(p, ground, inlier)
        return inlier, ground, plane

    @functools.partial(jax.jit, static_argnames=("config",))
    def stage_preprocess(cloud, config: PipelineConfig):
        return pp.preprocess(cloud, config)

    @functools.partial(jax.jit, static_argnames=("config",))
    def stage_density(cloud, config: PipelineConfig):
        processed = pp.preprocess(cloud, config)
        people = dm.extract_people(processed, config)
        return dm.analyze_density(processed, people, config)

    stages = {
        "stats_ground_plane": (
            stage_stats, lambda i: (clouds[i], cfg),
            lambda r: r[2]),
        "preprocess_full(+clustering)": (
            stage_preprocess, lambda i: (clouds[i], cfg),
            lambda r: r.n_clusters),
        "+people+density": (
            stage_density, lambda i: (clouds[i], cfg),
            lambda r: r.total_people),
        "full(+flow)": (
            analyze_cloud, lambda i: (clouds[i], uni, cfg),
            lambda r: r[2].flow.avg_speed),
    }

    out = {"points": n, "device": str(jax.devices()[0])}
    prev = 0.0
    for name, (fn, mk, pull) in stages.items():
        t0 = time.time()
        s = device_timer(fn, mk, pull, iters=args.iters, warmup=1)
        out[name] = {"s": round(s, 4), "delta_s": round(s - prev, 4),
                     "compile_s": round(time.time() - t0
                                        - s * (args.iters + 1), 1)}
        prev = s
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
