#!/usr/bin/env python
"""Round-5: honest device-resident dissection of the CCL build path and
A/B of the dispatch-matmul fill/extract kernels at scale."""

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
    ncx, ncy = cap.cluster_cells_x, cap.cluster_cells_y
    ccap = cap.cluster_column_cap
    buf = cap.cluster_capacity
    px = ncx + 2
    pyp = ccl._round_up(ncy + 2, 128)
    print(json.dumps({"ncx": ncx, "cap": ccap, "buf": buf, "px": px,
                      "pyp": pyp}), flush=True)

    z = pts_np[:, 2]
    ng = z > np.percentile(z, 30)
    sel = pts_np[ng]
    m = min(len(sel), buf)
    pad = np.zeros((buf, 3), np.float32)
    pad[:m] = sel[:m]
    mask_np = np.zeros(buf, bool)
    mask_np[:m] = True

    # device-resident base; per-iter perturbation happens ON DEVICE
    base = jax.device_put(jnp.asarray(pad))
    mask = jax.device_put(jnp.asarray(mask_np))
    base, mask = jax.block_until_ready((base, mask))

    out = {}

    def rec(name, f, argfn, pull, iters=None):
        fj = jax.jit(f)
        try:
            dt = device_timer(fj, argfn, pull, iters=iters or args.iters)
            out[name] = round(dt * 1000, 2)
        except Exception as e:
            out[name] = repr(e)[:400]
        print(json.dumps({name: out[name]}), flush=True)

    mk = lambda i: (base + i * 1e-4, mask)

    # ---- current build + pieces -----------------------------------------
    def d1(p, msk):
        g = ccl.build_planes(p, msk, min_cell=eps, ncx=ncx, ncy=ncy,
                             cap=ccap)
        return g.overflow, g.xs

    rec("build_current", d1, mk, lambda r: r[0])

    def cid_of(p, msk):
        dt = p.dtype
        big = jnp.asarray(jnp.finfo(dt).max, dt)
        pmin = jnp.min(jnp.where(msk[:, None], p[:, :2], big), axis=0)
        pmax = jnp.max(jnp.where(msk[:, None], p[:, :2], -big), axis=0)
        cell = jnp.maximum(
            jnp.asarray(eps, dt),
            jnp.maximum((pmax[0] - pmin[0]) / (ncx - 1e-3),
                        (pmax[1] - pmin[1]) / (ncy - 1e-3)))
        cx = jnp.clip(jnp.floor((p[:, 0] - pmin[0]) / cell).astype(
            jnp.int32), 0, ncx - 1)
        cy = jnp.clip(jnp.floor((p[:, 1] - pmin[1]) / cell).astype(
            jnp.int32), 0, ncy - 1)
        return jnp.where(msk, (cx + 1) * pyp + (cy + 1), px * pyp), cell, pmin

    def sort5(p, msk):
        cid, cell, pmin = cid_of(p, msk)
        i32 = jnp.arange(p.shape[0], dtype=jnp.int32)
        scid, sx, sy, sz, sidx = jax.lax.sort(
            (cid, p[:, 0], p[:, 1], p[:, 2], i32.astype(jnp.float32)),
            num_keys=1)
        return scid, sx, sy, sz, sidx, cell, pmin

    rec("cid_plus_sort5", sort5, mk, lambda r: r[0][0])

    def streams(p, msk):
        scid, sx, sy, sz, sidx, cell, pmin = sort5(p, msk)
        i32 = jnp.arange(p.shape[0], dtype=jnp.int32)
        is_start = jnp.concatenate([
            jnp.ones((1,), bool), scid[1:] != scid[:-1]])
        first = jax.lax.cummax(jnp.where(is_start, i32, 0))
        slots = i32 - first
        srow = scid // pyp
        syl = scid % pyp
        overflow = jnp.sum(((scid < px * pyp)
                            & (slots >= ccap)).astype(jnp.int32))
        return srow, syl, slots, sx, sy, sz, sidx, overflow

    rec("streams_total", streams, mk, lambda r: r[0][0])

    # ---- NEW: dispatch-matmul fill --------------------------------------
    def build_new(p, msk):
        srow, syl, slots, sx, sy, sz, sidx, overflow = streams(p, msk)
        acc = fill.fill_planes(srow, syl, slots, sx, sy, sz, sidx,
                               px, ccap, pyp)
        return acc, overflow

    rec("build_fill_matmul", build_new, mk, lambda r: r[1])

    # postprocess to planes
    def build_new_full(p, msk):
        acc, overflow = build_new(p, msk)
        occ = acc[:, 4 * ccap:] > 0.5
        xs = jnp.where(occ, acc[:, :ccap], ccl.EMPTY_COORD)
        ys = jnp.where(occ, acc[:, ccap:2 * ccap], ccl.EMPTY_COORD)
        zs = jnp.where(occ, acc[:, 2 * ccap:3 * ccap], ccl.EMPTY_COORD)
        ptidx = jnp.where(occ, acc[:, 3 * ccap:4 * ccap].astype(jnp.int32),
                          -1)
        return xs, ys, zs, ptidx, overflow

    rec("build_fill_full", build_new_full, mk, lambda r: r[4])

    # ---- NEW: extract vs gather -----------------------------------------
    r0 = jax.jit(build_new_full)(*mk(0))
    xs0, ys0, zs0, ptidx0, _ = jax.block_until_ready(r0)
    lab_f32 = jnp.where(ptidx0 >= 0, ptidx0.astype(jnp.float32), 0.0)
    st0 = jax.jit(streams)(*mk(0))
    srow0, syl0, slots0 = jax.block_until_ready(st0[:3])

    def ext(lab, srow, syl, slots):
        return fill.extract_stream(lab, srow, syl, slots)

    rec("extract_matmul", ext,
        lambda i: (lab_f32 + i * 0.0, srow0, syl0, slots0),
        lambda r: r[0])

    # unsort cost (sorted -> point order): one 2-lane sort
    sidx0 = jax.block_until_ready(jax.jit(streams)(*mk(0))[6])

    def unsort(vals, sidx):
        _, out2 = jax.lax.sort((sidx.astype(jnp.int32), vals), num_keys=1)
        return out2

    ext0 = jax.block_until_ready(jax.jit(ext)(
        lab_f32, srow0, syl0, slots0))
    rec("unsort_sort2", unsort, lambda i: (ext0 + i * 0.0, sidx0),
        lambda r: r[0])

    # current comparison: point-order gather from full table
    g0 = jax.jit(lambda p, msk: ccl.build_planes(
        p, msk, min_cell=eps, ncx=ncx, ncy=ncy, cap=ccap))(*mk(0))
    g0 = jax.block_until_ready(g0)
    fake_labels = jnp.where(g0.ptidx >= 0, g0.ptidx, ccl.INT_MAX)

    def e1(point_pos, labels):
        flat = jnp.concatenate([labels.reshape(-1),
                                jnp.array([ccl.INT_MAX], jnp.int32)])
        return flat[jnp.clip(point_pos, 0, labels.size)]

    rec("gather_current", e1, lambda i: (g0.point_pos + (i - i),
                                         fake_labels),
        lambda r: r[0])

    # correctness: new build == old build where occupied
    occ_new = np.asarray(ptidx0 >= 0)
    occ_old = np.asarray(g0.ptidx >= 0)
    out["occ_match"] = bool((occ_new == occ_old).all())
    out["ptidx_match"] = bool(
        (np.asarray(ptidx0) == np.asarray(g0.ptidx)).all())
    xs_old = np.asarray(g0.xs)
    out["xs_match"] = bool(
        (np.asarray(xs0)[occ_old] == xs_old[occ_old]).all())

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
