#!/usr/bin/env python
"""Micro-benchmark one label-propagation sweep formulation at scale.

Times fixed-count sweep loops (fori, no convergence check) for N=1 and
N=2; the delta is the true per-sweep cost. Compares formulations:
  dist   — column_min_label (distance recompute per sweep)
  adj    — packed-adjacency bit-select (adjacency_min_label; adjacency
           precomputed outside the loop)

Usage: python benchmarks/profile_sweep.py [--points 1000000] [--which dist]
"""

from __future__ import annotations

import argparse
import functools
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--which", default="dist", choices=["dist", "adj"])
    ap.add_argument("--jumps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lidar_ai_recommendation_software_tpu.config import MONOLITH_CONFIG
    from lidar_ai_recommendation_software_tpu.ops import clustering, columns
    import os, sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import packed_adjacency as padj
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
    ms = cfg.preprocess.dbscan_min_samples
    ncx, ncy = cap.cluster_cells_x, cap.cluster_cells_y
    ccap = cap.cluster_column_cap
    INT_MAX = clustering.INT_MAX
    stripe = max(8, min(64, ncx // 8))

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

    def make_prog(nsweeps: int):
        @jax.jit
        def prog(p, mk_):
            g = columns.build_column_grid(p, mk_, min_cell=eps, ncx=ncx,
                                          ncy=ncy, cap=ccap)
            counts = columns.column_counts(g, eps, stripe=stripe)
            valid_int = g.table_valid[1:-1, 1:-1]
            core_int = valid_int & (counts >= ms)
            core_pad = columns.pad_interior(core_int, False)
            ptidx_int = g.table_ptidx[1:-1, 1:-1]
            labels0 = jnp.where(core_int, ptidx_int, INT_MAX)
            pos_by_point = g.point_pos
            padded_size = g.table_ptidx.size
            nn = p.shape[0]

            if args.which == "adj":
                adj = padj.column_adjacency(g, eps, g.table_valid,
                                               stripe=stripe)
                core_words = columns.pad_interior(
                    padj.pack_slots(core_int), jnp.uint32(0))
                shifted = [core_words[1 + dx:1 + dx + ncx,
                                      1 + dy:1 + dy + ncy]
                           for dx, dy in columns.OFFSETS_3X3]
                adj_core = adj & jnp.stack(
                    shifted, axis=-2)[:, :, None, :, :]
                adj_core_pad = columns.pad_interior(adj_core, jnp.uint32(0))

            def to_point_order(labels_int):
                flat = jnp.concatenate(
                    [columns.pad_interior(labels_int, INT_MAX).reshape(-1),
                     jnp.array([INT_MAX], jnp.int32)])
                return flat[jnp.clip(pos_by_point, 0, padded_size)]

            def jump(labels_int, labels_by_point):
                safe = jnp.clip(labels_int, 0, nn - 1)
                hop = labels_by_point[safe]
                ok = (labels_int != INT_MAX) & (hop != INT_MAX)
                return jnp.where(ok, jnp.minimum(labels_int, hop),
                                 labels_int)

            def sweep(_, labels):
                if args.which == "dist":
                    nbr_min = columns.column_min_label(
                        g, columns.pad_interior(labels, INT_MAX), core_pad,
                        eps, INT_MAX, stripe=stripe)
                else:
                    nbr_min = padj.adjacency_min_label(
                        adj_core_pad,
                        columns.pad_interior(labels, INT_MAX),
                        INT_MAX, stripe=stripe)
                new = jnp.where(core_int, jnp.minimum(labels, nbr_min),
                                labels)
                for _ in range(args.jumps):
                    new = jump(new, to_point_order(new))
                return new

            labels = jax.lax.fori_loop(0, nsweeps, sweep, labels0)
            return jnp.sum(jnp.where(labels == INT_MAX, 0, 1))
        return prog

    out = {"which": args.which, "points": n}
    prev = None
    for nsweeps in (1, 2):
        t0 = time.time()
        fn = make_prog(nsweeps)
        s = device_timer(fn, mk, lambda r: r, iters=2, warmup=1)
        out[f"sweeps{nsweeps}"] = round(s, 4)
        out[f"compile{nsweeps}"] = round(time.time() - t0, 1)
        if prev is not None:
            out["per_sweep_s"] = round(s - prev, 4)
        prev = s
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
