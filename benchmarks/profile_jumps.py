#!/usr/bin/env python
"""Micro-bench the pointer-jump machinery: to_point_order (table pad +
flat gather) and jump (two n-gathers) costs at scale, isolated from the
neighborhood pass.

Usage: python benchmarks/profile_jumps.py [--points 1000000]
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1_000_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lidar_ai_recommendation_software_tpu.config import MONOLITH_CONFIG
    from lidar_ai_recommendation_software_tpu.ops import clustering, columns
    from lidar_ai_recommendation_software_tpu.pipeline import (
        Pipeline, enable_compilation_cache)
    from lidar_ai_recommendation_software_tpu.synthetic import scaled_venue
    from lidar_ai_recommendation_software_tpu.utils.profiling import (
        device_timer)

    enable_compilation_cache()
    n = args.points
    pts_np = scaled_venue(n)
    pipe = Pipeline()
    cfg = pipe.fit_capacity(pts_np)
    cap = cfg.capacity
    eps = cfg.preprocess.dbscan_eps
    ncx, ncy = cap.cluster_cells_x, cap.cluster_cells_y
    ccap = cap.cluster_column_cap
    INT_MAX = clustering.INT_MAX

    z = pts_np[:, 2]
    ng = z > np.percentile(z, 30)
    sel = pts_np[ng]
    buf = cap.cluster_capacity
    m = min(len(sel), buf)
    pad = np.zeros((buf, 3), np.float32)
    pad[:m] = sel[:m]
    mask_np = np.zeros(buf, bool)
    mask_np[:m] = True

    def mk(i):
        return (jnp.asarray(pad + i * 1e-4), jnp.asarray(mask_np))

    def make_prog(njumps: int):
        @jax.jit
        def prog(p, mk_):
            g = columns.build_column_grid(p, mk_, min_cell=eps, ncx=ncx,
                                          ncy=ncy, cap=ccap)
            valid_int = g.table_valid[1:-1, 1:-1]
            ptidx_int = g.table_ptidx[1:-1, 1:-1]
            labels = jnp.where(valid_int, ptidx_int, INT_MAX)
            pos_by_point = g.point_pos
            padded_size = g.table_ptidx.size
            nn = p.shape[0]

            def body(k, new):
                flat = jnp.concatenate(
                    [columns.pad_interior(new, INT_MAX).reshape(-1),
                     jnp.array([INT_MAX], jnp.int32)])
                lbp = flat[jnp.clip(pos_by_point, 0, padded_size)]
                safe = jnp.clip(new, 0, nn - 1)
                hop = lbp[safe + k * 0]
                ok = (new != INT_MAX) & (hop != INT_MAX)
                return jnp.where(ok, jnp.minimum(new, hop), new)

            out = jax.lax.fori_loop(0, njumps, body, labels)
            return jnp.sum(jnp.where(out == INT_MAX, 0, 1))
        return prog

    out = {"points": n}
    prev = None
    for nj in (2, 10):
        t0 = time.time()
        fn = make_prog(nj)
        s = device_timer(fn, mk, lambda r: r, iters=2, warmup=1)
        out[f"jumps{nj}"] = round(s, 4)
        if prev is not None:
            out["per_jump_s"] = round((s - prev) / 8, 4)
        prev = s
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
