#!/usr/bin/env python
"""Round-5: dissect the remaining CCL stage cost at 10M (build / counts /
GS groups / border / extract) with device-resident inputs."""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=10_000_000)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lidar_ai_recommendation_software_tpu.ops import ccl
    from lidar_ai_recommendation_software_tpu.ops.pallas import fill
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
    ms_ = cfg.preprocess.dbscan_min_samples
    ncx, ncy = cap.cluster_cells_x, cap.cluster_cells_y
    ccap = cap.cluster_column_cap
    buf = cap.cluster_capacity
    out = {"n": n, "buf": buf, "cap": ccap}

    z = pts_np[:, 2]
    ng = z > np.percentile(z, 30)
    sel = pts_np[ng]
    m = min(len(sel), buf)
    pad = np.zeros((buf, 3), np.float32)
    pad[:m] = sel[:m]
    mask_np = np.zeros(buf, bool)
    mask_np[:m] = True
    base = jax.device_put(jnp.asarray(pad))
    mask = jax.device_put(jnp.asarray(mask_np))
    base, mask = jax.block_until_ready((base, mask))
    mk = lambda i: (base + i * 1e-4, mask)

    def rec(name, f, argfn, pull):
        fj = jax.jit(f)
        try:
            dt = device_timer(fj, argfn, pull, iters=args.iters)
            out[name] = round(dt * 1000, 2)
        except Exception as e:
            out[name] = repr(e)[:300]
        print(json.dumps({name: out[name]}), flush=True)

    def build(p, msk):
        g = ccl.build_planes_stream(p, msk, min_cell=eps, ncx=ncx,
                                    ncy=ncy, cap=ccap)
        return g

    rec("build_stream_highest", build, mk, lambda r: r.overflow)

    g0 = jax.block_until_ready(jax.jit(build)(*mk(0)))
    px, cp, pyp = g0.xs.shape

    def counts(xs, ys, zs):
        pl_ = ccl.ColumnPlanes(xs=xs, ys=ys, zs=zs, ptidx=g0.ptidx,
                               point_pos=jnp.zeros((1,), jnp.int32),
                               cell=g0.cell, origin=g0.origin,
                               overflow=g0.overflow)
        return ccl.column_counts_planes(pl_, eps)

    rec("counts_kernel", counts, lambda i: (g0.xs + i * 0.0, g0.ys, g0.zs),
        lambda r: r[0, 0, 0])

    cts = jax.block_until_ready(jax.jit(counts)(g0.xs, g0.ys, g0.zs))
    cts_p = jnp.pad(cts, ((1, 1), (0, 0), (0, 0)))
    valid = g0.ptidx >= 0
    core = valid & (cts_p >= ms_)
    labels0 = jnp.where(core, g0.ptidx, ccl.INT_MAX)
    labels0 = jax.block_until_ready(labels0)

    def one_group(lab):
        xs_t = ccl._transpose_planes(g0.xs, ncx, ncy)
        ys_t = ccl._transpose_planes(g0.ys, ncx, ncy)
        zs_t = ccl._transpose_planes(g0.zs, ncx, ncy)
        lab, chx, _ = ccl.gs_passes((g0.xs, g0.ys, g0.zs), lab, eps,
                                    npass=2)
        lab_t = ccl._transpose_planes(lab, ncx, ncy)
        lab_t, chy, _ = ccl.gs_passes((xs_t, ys_t, zs_t), lab_t, eps,
                                      npass=2)
        return ccl._untranspose_labels(lab_t, px, pyp), chy

    rec("one_group_incl_coord_transpose", one_group,
        lambda i: (labels0 + i - i,), lambda r: r[1][0])

    def border(lab):
        pl_ = ccl.ColumnPlanes(xs=g0.xs, ys=g0.ys, zs=g0.zs,
                               ptidx=g0.ptidx,
                               point_pos=jnp.zeros((1,), jnp.int32),
                               cell=g0.cell, origin=g0.origin,
                               overflow=g0.overflow)
        return ccl.border_min_planes(pl_, lab, eps)

    rec("border_kernel", border, lambda i: (labels0 + i - i,),
        lambda r: r[0, 0, 0])

    def extract(lab):
        lab_f = jnp.where(lab == ccl.INT_MAX, 0.0,
                          (lab + 1).astype(jnp.float32))
        got = fill.extract_stream(lab_f, g0.srow, g0.sy, g0.slots)
        ls = got.astype(jnp.int32) - 1
        _, lp = jax.lax.sort((g0.sidx, ls), num_keys=1)
        return lp

    rec("extract_plus_unsort", extract, lambda i: (labels0 + i - i,),
        lambda r: r[0])

    # realised group count in the full dbscan_gs
    @jax.jit
    def gs_iters(p, msk):
        planes = ccl.build_planes_stream(p, msk, min_cell=eps, ncx=ncx,
                                         ncy=ncy, cap=ccap)
        cts2 = ccl.column_counts_planes(planes, eps)
        cts2 = jnp.pad(cts2, ((1, 1), (0, 0), (0, 0)))
        valid2 = planes.ptidx >= 0
        core2 = valid2 & (cts2 >= ms_)
        lab = jnp.where(core2, planes.ptidx, ccl.INT_MAX)
        xs_t = ccl._transpose_planes(planes.xs, ncx, ncy)
        ys_t = ccl._transpose_planes(planes.ys, ncx, ncy)
        zs_t = ccl._transpose_planes(planes.zs, ncx, ncy)

        def group(state):
            lab, _, it = state
            lab, _, _ = ccl.gs_passes((planes.xs, planes.ys, planes.zs),
                                      lab, eps, npass=2)
            lab_t = ccl._transpose_planes(lab, ncx, ncy)
            lab_t, chy, _ = ccl.gs_passes((xs_t, ys_t, zs_t), lab_t,
                                          eps, npass=2)
            return (ccl._untranspose_labels(lab_t, px, pyp),
                    jnp.sum(chy[-1]), it + 1)

        lab, _, iters = jax.lax.while_loop(
            lambda s: (s[1] > 0) & (s[2] < cap.max_cc_iters), group,
            (lab, jnp.asarray(1, jnp.int32), jnp.asarray(0, jnp.int32)))
        return iters

    out["realised_groups"] = int(jax.block_until_ready(
        gs_iters(*mk(0))))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
