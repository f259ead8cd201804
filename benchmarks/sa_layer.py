#!/usr/bin/env python
"""Single set-abstraction layer benchmark (BASELINE.md config 2):
FPS + ball-query grouping + shared-MLP pooling on an N-point frame.

Runs the layer three ways and reports points/s plus roofline accounting
(% of the chip's peak MXU FLOPs and HBM bandwidth, utils/profiling.py):

  jnp        — XLA-compiled jnp ops (the differentiable training path)
  fused      — Pallas ``fps`` + ``sa_mlp_pool`` kernels, f32 MXU
  fused_bf16 — same kernels, bf16 MXU feed (f32 accumulate)

The fused paths are the serving/benchmark configuration (BASELINE.json
north star: FPS + ball-query + SA kernels at speed-of-light per chip);
max|diff| between jnp and fused outputs is printed as the equivalence
check. Usage: python benchmarks/sa_layer.py [--points 100000]
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
    from lidar_ai_recommendation_software_tpu.ops.pallas import (
        kernels as pk)
    from lidar_ai_recommendation_software_tpu.ops.sampling import (
        farthest_point_sampling)
    from lidar_ai_recommendation_software_tpu.synthetic import scaled_venue
    from lidar_ai_recommendation_software_tpu.utils.profiling import (
        device_timer, roofline)

    n, m, k = args.points, args.samples, args.k
    pts_np = scaled_venue(n).astype(np.float32)
    rng = np.random.RandomState(0)
    w = []
    dims = [3] + list(args.channels)
    for a, b in zip(dims[:-1], dims[1:]):
        w.append((jnp.asarray(rng.randn(a, b) * 0.1, jnp.float32),
                  jnp.zeros(b, jnp.float32)))

    mask = jnp.ones(n, bool)

    def sa_layer(points, fused, compute_dtype=jnp.float32):
        if fused:
            idx = pk.fps(points, mask, m)
        else:
            idx = farthest_point_sampling(points, mask, m)
        cents = points[idx]
        cmask = mask[idx]
        gidx, gvalid = ball_group(cents, cmask, points, mask,
                                  args.radius, k)
        g = group_features(points, None, cents, gidx, gvalid)
        if fused:
            return pk.sa_mlp_pool(g, gvalid, w,
                                  compute_dtype=compute_dtype)
        x = g
        for wi, bi in w:
            x = jnp.maximum(
                jnp.einsum("mkc,cd->mkd", x, wi,
                           preferred_element_type=jnp.float32) + bi, 0.0)
        x = jnp.where(gvalid[..., None], x, -1e9)
        return jnp.max(x, axis=1)

    clouds = [jnp.asarray(pts_np + i * 1e-4) for i in range(args.iters + 2)]

    # equivalence: fused vs jnp on the same cloud
    ref = np.asarray(jax.jit(lambda p: sa_layer(p, False))(clouds[0]))
    fus = np.asarray(jax.jit(lambda p: sa_layer(p, True))(clouds[0]))
    max_diff = float(np.abs(ref - fus).max())

    # flop/byte model: FPS m*n (~8/pair distance+min) + ball query m*n
    # (~8) + MLP 2*m*k*sum(cin*cout); bytes: points in, grouped tensor
    # once through VMEM, pooled out
    mlp_flops = m * k * sum(2 * a * b for a, b in
                            zip(dims[:-1], dims[1:]))
    flops = m * n * 8 + m * n * 8 + mlp_flops
    bytes_accessed = (n * 3 * 4 + m * k * dims[0] * 4
                      + m * dims[-1] * 4)

    variants = {}
    for name, fused, dt in (("jnp", False, jnp.float32),
                            ("fused", True, jnp.float32),
                            ("fused_bf16", True, jnp.bfloat16)):
        f = jax.jit(lambda p, fused=fused, dt=dt: sa_layer(p, fused, dt))
        sec = device_timer(f, lambda i: (clouds[i % len(clouds)],),
                           lambda r: r[0, 0], iters=args.iters)
        rl = roofline(flops, bytes_accessed, sec)
        variants[name] = {
            "ms_per_layer": round(sec * 1000, 2),
            "points_per_sec": round(n / sec),
            "achieved_tflops": round(rl["achieved_tflops"], 3),
            "achieved_gbps": round(rl.get("achieved_gbps", 0.0), 2),
            "pct_peak_flops": round(rl.get("pct_peak_flops", 0.0), 3),
            "pct_peak_bw": round(rl.get("pct_peak_bw", 0.0), 3),
        }

    best = variants["fused_bf16"]
    print(json.dumps({
        "metric": "sa_layer_points_per_sec",
        "points": n, "samples": m, "k": k,
        "ms_per_layer": best["ms_per_layer"],
        "points_per_sec": best["points_per_sec"],
        "pct_peak_flops": best["pct_peak_flops"],
        "max_diff_fused_vs_jnp": max_diff,
        "variants": variants,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
