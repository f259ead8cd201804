#!/usr/bin/env python
"""Single set-abstraction layer benchmark (BASELINE.md config 2):
FPS + ball-query grouping + shared-MLP pooling on an N-point frame,
points/s/chip vs a simple roofline estimate.

Usage: python benchmarks/sa_layer.py [--points 100000] [--samples 4096]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--samples", type=int, default=4096)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--radius", type=float, default=0.6)
    ap.add_argument("--channels", type=int, nargs=3,
                    default=[32, 32, 64])
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lidar_ai_recommendation_software_tpu.ops.grouping import (
        ball_group, group_features)
    from lidar_ai_recommendation_software_tpu.ops.sampling import (
        farthest_point_sampling)
    from lidar_ai_recommendation_software_tpu.synthetic import scaled_venue
    from lidar_ai_recommendation_software_tpu.utils.profiling import (
        device_timer)

    n, m, k = args.points, args.samples, args.k
    pts_np = scaled_venue(n).astype(np.float32)
    rng = np.random.RandomState(0)
    w = []
    dims = [3] + list(args.channels)
    for a, b in zip(dims[:-1], dims[1:]):
        w.append((jnp.asarray(rng.randn(a, b) * 0.1, jnp.float32),
                  jnp.zeros(b, jnp.float32)))

    mask = jnp.ones(n, bool)

    def sa_layer(points):
        idx = farthest_point_sampling(points, mask, m)
        cents = points[idx]
        cmask = mask[idx]
        gidx, gvalid = ball_group(cents, cmask, points, mask,
                                  args.radius, k)
        g = group_features(points, None, cents, gidx, gvalid)
        x = g
        for wi, bi in w:
            x = jnp.maximum(
                jnp.einsum("mkc,cd->mkd", x, wi,
                           preferred_element_type=jnp.float32) + bi, 0.0)
        x = jnp.where(gvalid[..., None], x, -1e9)
        return jnp.max(x, axis=1)

    f = jax.jit(sa_layer)
    clouds = [jnp.asarray(pts_np + i * 1e-4) for i in range(args.iters + 1)]
    dt = device_timer(f, lambda i: (clouds[i % len(clouds)],),
                      lambda r: r[0, 0], iters=args.iters)

    # roofline: FPS m*n distance flops (~8/pair) + grouping m*n (~8) +
    # MLP m*k*(sum of 2*cin*cout)
    mlp_flops = m * k * sum(2 * a * b for a, b in
                            zip(dims[:-1], dims[1:]))
    flops = m * n * 8 + m * n * 8 + mlp_flops
    print(json.dumps({
        "metric": "sa_layer_points_per_sec",
        "points": n, "samples": m, "k": k,
        "ms_per_layer": round(dt * 1000, 2),
        "points_per_sec": round(n / dt),
        "approx_gflops": round(flops / dt / 1e9, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
