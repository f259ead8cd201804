#!/usr/bin/env python
"""Round-5: dissect the venue-scale centroid path (sort1 / prefix /
pack-sort) to target VERDICT item 6."""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=10_485_760)
    ap.add_argument("--people", type=int, default=1_310_720)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lidar_ai_recommendation_software_tpu.ops import clustering as cl
    from lidar_ai_recommendation_software_tpu.pipeline import (
        enable_compilation_cache)
    from lidar_ai_recommendation_software_tpu.utils.profiling import (
        device_timer)

    enable_compilation_cache()
    n, k = args.points, args.people
    rng = np.random.RandomState(0)
    pts = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
    # ~600k clusters of ~12 points + noise, like the 10M venue census
    seg_np = np.minimum(rng.randint(0, k + k // 4, n), k).astype(np.int32)
    base = jax.device_put(jnp.asarray(pts))
    seg = jax.device_put(jnp.asarray(seg_np))
    base, seg = jax.block_until_ready((base, seg))
    out = {"n": n, "k": k}

    def rec(name, f, argfn, pull):
        fj = jax.jit(f)
        try:
            dt = device_timer(fj, argfn, pull, iters=args.iters)
            out[name] = round(dt * 1000, 2)
        except Exception as e:
            out[name] = repr(e)[:300]
        print(json.dumps({name: out[name]}), flush=True)

    mk = lambda i: (base + i * 1e-4, seg)

    def full(p, s):
        return cl._centroids_sorted(p, s, k)

    rec("centroids_sorted_full", full, mk, lambda r: r[0][0, 0])

    def sort1(p, s):
        cols = [p[:, i] for i in range(3)]
        return jax.lax.sort((s,) + tuple(cols), num_keys=1)

    rec("sort1_4lane", sort1, mk, lambda r: r[0][0])

    s0 = jax.block_until_ready(jax.jit(sort1)(*mk(0)))
    seg_s = s0[0]
    pts_s = jnp.stack(s0[1:], axis=1)

    def prefix(ps):
        def op(a, b):
            (s1, e1), c1 = a
            (s2, e2), c2 = b
            return cl._df_add((s1, e1), (s2, e2)), c1 + c2
        return cl._blocked_prefix(
            op, ((ps, jnp.zeros_like(ps)), jnp.ones((n,), jnp.int32)))

    rec("prefix_df", prefix, lambda i: (pts_s + i * 0.0,),
        lambda r: r[0][0][0, 0])

    pr = jax.block_until_ready(jax.jit(prefix)(pts_s))
    (s_hi, s_lo), cnt = pr

    def pack(hi, lo, cn, ss):
        is_end = jnp.concatenate([ss[1:] != ss[:-1],
                                  jnp.ones((1,), bool)])
        key = jnp.where(is_end & (ss < k), ss, jnp.int32(k))
        packed = jax.lax.sort(
            (key,) + tuple(hi[:, i] for i in range(3))
            + tuple(lo[:, i] for i in range(3)) + (cn,), num_keys=1)
        return packed[0]

    rec("pack_sort_8lane", pack,
        lambda i: (s_hi + i * 0.0, s_lo, cnt, seg_s),
        lambda r: r[0])

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
