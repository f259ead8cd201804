#!/usr/bin/env python
"""Round-5 experiment: dissect build_planes + label-return costs at scale
and A/B the scatter variants. Not part of the product path.

Usage: python benchmarks/exp_fill.py [--points 10000000]
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=10_000_000)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lidar_ai_recommendation_software_tpu.ops import ccl
    from lidar_ai_recommendation_software_tpu.ops.pallas import permute
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
    print(json.dumps({"ncx": ncx, "ncy": ncy, "cap": ccap, "buf": buf}),
          flush=True)

    z = pts_np[:, 2]
    ng = z > np.percentile(z, 30)
    sel = pts_np[ng]
    m = min(len(sel), buf)
    pad = np.zeros((buf, 3), np.float32)
    pad[:m] = sel[:m]
    mask_np = np.zeros(buf, bool)
    mask_np[:m] = True

    def mk(i):
        return (jnp.asarray(pad + i * 1e-4), jnp.asarray(mask_np))

    out = {}

    def rec(name, f, argfn, pull):
        fj = jax.jit(f)
        try:
            dt = device_timer(fj, argfn, pull, iters=args.iters)
            out[name] = round(dt * 1000, 2)
        except Exception as e:
            out[name] = repr(e)[:200]
        print(json.dumps({name: out[name]}), flush=True)

    px = ncx + 2
    pyp = ccl._round_up(ncy + 2, 128)

    # ---- stage A: cid + sort + slots (shared by every variant) ----------
    def stage_a(p, mask):
        dt = p.dtype
        big = jnp.asarray(jnp.finfo(dt).max, dt)
        pmin = jnp.min(jnp.where(mask[:, None], p[:, :2], big), axis=0)
        pmax = jnp.max(jnp.where(mask[:, None], p[:, :2], -big), axis=0)
        cell = jnp.maximum(
            jnp.asarray(eps, dt),
            jnp.maximum((pmax[0] - pmin[0]) / (ncx - 1e-3),
                        (pmax[1] - pmin[1]) / (ncy - 1e-3)))
        cx = jnp.clip(jnp.floor((p[:, 0] - pmin[0]) / cell).astype(
            jnp.int32), 0, ncx - 1)
        cy = jnp.clip(jnp.floor((p[:, 1] - pmin[1]) / cell).astype(
            jnp.int32), 0, ncy - 1)
        ncells = px * pyp
        cid = jnp.where(mask, (cx + 1) * pyp + (cy + 1), ncells)
        order = jnp.argsort(cid).astype(jnp.int32)
        return cid, order

    rec("A_cid_argsort", stage_a, lambda i: mk(i), lambda r: r[1][0])

    def stage_ab(p, mask):
        cid, order = stage_a(p, mask)
        nn = p.shape[0]
        sorted_cid = cid[order]
        i32 = jnp.arange(nn, dtype=jnp.int32)
        is_start = jnp.concatenate([
            jnp.ones((1,), bool), sorted_cid[1:] != sorted_cid[:-1]])
        first = jax.lax.cummax(jnp.where(is_start, i32, 0))
        slots_sorted = i32 - first
        return cid, order, sorted_cid, slots_sorted

    def stage_abc(p, mask):
        cid, order, sorted_cid, slots_sorted = stage_ab(p, mask)
        slots = permute.permutation_scatter(order, slots_sorted)
        return cid, slots

    rec("AB_plus_permscatter", stage_abc, lambda i: mk(i),
        lambda r: r[1][0])

    # ---- D1: current width-4 scatter (point order) ----------------------
    def d1(p, mask):
        g = ccl.build_planes(p, mask, min_cell=eps, ncx=ncx, ncy=ncy,
                             cap=ccap)
        return g.overflow, g.xs

    rec("D1_build_planes_current", d1, lambda i: mk(i), lambda r: r[0])

    # ---- D2: sorted+unique scatter in monotonic (x,y,slot) layout -------
    def d2(p, mask):
        cid, order, sorted_cid, slots_sorted = stage_ab(p, mask)
        nn = p.shape[0]
        # carry payload through one extra sort instead of gathering
        _, sx, sy, sz, sidx = jax.lax.sort(
            (cid, p[:, 0], p[:, 1], p[:, 2],
             jnp.arange(nn, dtype=jnp.int32).astype(jnp.float32)),
            num_keys=1)
        spill = px * pyp * ccap
        flat = jnp.where(sorted_cid < px * pyp,
                         sorted_cid * ccap + slots_sorted, spill)
        flat = jnp.where(slots_sorted < ccap, flat, spill)
        payload = jnp.stack([sx, sy, sz, sidx], axis=1)
        tab0 = jax.lax.bitcast_convert_type(
            jnp.full((spill + 1, 4), -1, jnp.int32), jnp.float32)
        table = tab0.at[flat].set(
            payload, indices_are_sorted=True,
            unique_indices=True)[:spill].reshape(px, pyp, ccap, 4)
        # transpose to kernel layout (PX, CAP, PYP)
        xs = jnp.swapaxes(table[..., 0], 1, 2)
        return xs

    rec("D2_sorted_unique_scatter", d2, lambda i: mk(i),
        lambda r: r[0, 0, 0])

    # ---- E: the label-return gather (point order from table) ------------
    g0 = jax.jit(lambda p, mask: ccl.build_planes(
        p, mask, min_cell=eps, ncx=ncx, ncy=ncy, cap=ccap))(*mk(0))
    g0 = jax.block_until_ready(g0)
    fake_labels = jnp.where(g0.ptidx >= 0, g0.ptidx, ccl.INT_MAX)

    def e1(point_pos, labels):
        flat = jnp.concatenate([labels.reshape(-1),
                                jnp.array([ccl.INT_MAX], jnp.int32)])
        return flat[jnp.clip(point_pos, 0, labels.size)]

    rec("E_point_order_gather", e1,
        lambda i: (g0.point_pos + (i - i), fake_labels),
        lambda r: r[0])

    # ---- F: one GS pass group (for scale) --------------------------------
    def f1(xs, ys, zs, labels):
        lab, ch = ccl.gs_passes((xs, ys, zs), labels, eps, npass=2)
        return lab, ch

    rec("F_gs_2passes_x", f1,
        lambda i: (g0.xs, g0.ys, g0.zs, fake_labels),
        lambda r: r[1][0])

    def f2(xs):
        return ccl._transpose_planes(xs, ncx, ncy)

    rec("F_transpose_one_plane", f2, lambda i: (g0.xs + i * 0.0,),
        lambda r: r[0, 0, 0])

    # ---- G: jacobi counts kernel ----------------------------------------
    def gk(p, mask):
        g = ccl.build_planes(p, mask, min_cell=eps, ncx=ncx, ncy=ncy,
                             cap=ccap)
        return ccl.column_counts_planes(g, eps)

    rec("G_build_plus_counts", gk, lambda i: mk(i), lambda r: r[0, 0, 0])

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
