"""Dispatch-matmul table fill/extract (ops/pallas/fill.py) vs the XLA
scatter/gather build they replace."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_ai_recommendation_software_tpu.ops import ccl
from lidar_ai_recommendation_software_tpu.ops.pallas import fill


def _sorted_stream(pts, mask, eps, ncx, ncy, cap):
    """Replicate build_planes' cell assignment, in sorted order."""
    n = pts.shape[0]
    dt = pts.dtype
    big = jnp.asarray(jnp.finfo(dt).max, dt)
    pmin = jnp.min(jnp.where(mask[:, None], pts[:, :2], big), axis=0)
    pmax = jnp.max(jnp.where(mask[:, None], pts[:, :2], -big), axis=0)
    cell = jnp.maximum(
        jnp.asarray(eps, dt),
        jnp.maximum((pmax[0] - pmin[0]) / (ncx - 1e-3),
                    (pmax[1] - pmin[1]) / (ncy - 1e-3)))
    cx = jnp.clip(jnp.floor((pts[:, 0] - pmin[0]) / cell).astype(
        jnp.int32), 0, ncx - 1)
    cy = jnp.clip(jnp.floor((pts[:, 1] - pmin[1]) / cell).astype(
        jnp.int32), 0, ncy - 1)
    px = ncx + 2
    pyp = ccl._round_up(ncy + 2, 128)
    cid = jnp.where(mask, (cx + 1) * pyp + (cy + 1), px * pyp)
    i32 = jnp.arange(n, dtype=jnp.int32)
    scid, sx, sy, sz, sidx = jax.lax.sort(
        (cid, pts[:, 0], pts[:, 1], pts[:, 2],
         i32.astype(jnp.float32)), num_keys=1)
    is_start = jnp.concatenate([
        jnp.ones((1,), bool), scid[1:] != scid[:-1]])
    first = jax.lax.cummax(jnp.where(is_start, i32, 0))
    slots = i32 - first
    return (scid // pyp, scid % pyp, slots, sx, sy, sz, sidx, px, pyp)


@pytest.mark.parametrize("n,cap,tile", [(3000, 8, 128), (7000, 16, 256)])
def test_fill_matches_scatter_build(n, cap, tile):
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-20, 20, (n, 3)), jnp.float32)
    mask = jnp.asarray(rng.rand(n) > 0.1)
    ncx = ncy = 30
    eps = 0.5

    ref = ccl.build_planes(pts, mask, min_cell=eps, ncx=ncx, ncy=ncy,
                           cap=cap)
    srow, sy, sslot, sx, syc, sz, sidx, px, pyp = _sorted_stream(
        pts, mask, eps, ncx, ncy, cap)
    acc = fill.fill_planes(srow, sy, sslot, sx, syc, sz, sidx,
                           px, cap, pyp, tile=tile)
    occ = acc[:, 4 * cap:]
    xs = jnp.where(occ > 0.5, acc[:, :cap], ccl.EMPTY_COORD)
    ys = jnp.where(occ > 0.5, acc[:, cap:2 * cap], ccl.EMPTY_COORD)
    zs = jnp.where(occ > 0.5, acc[:, 2 * cap:3 * cap], ccl.EMPTY_COORD)
    ptidx = jnp.where(occ > 0.5,
                      acc[:, 3 * cap:4 * cap].astype(jnp.int32), -1)

    # every slot occupied in at most one table; coords bit-exact.
    # (the scatter build stores NaN/garbage coords in empty slots; the
    # matmul build stores EMPTY_COORD — both are rejected by distance
    # tests, so compare only on occupancy agreement + occupied values)
    ref_occ = np.asarray(ref.ptidx >= 0)
    np.testing.assert_array_equal(np.asarray(occ > 0.5), ref_occ)
    for got, want in ((xs, ref.xs), (ys, ref.ys), (zs, ref.zs)):
        np.testing.assert_array_equal(
            np.asarray(got)[ref_occ], np.asarray(want)[ref_occ])
    np.testing.assert_array_equal(np.asarray(ptidx), np.asarray(ref.ptidx))


def test_extract_reads_back_what_fill_wrote():
    rng = np.random.RandomState(1)
    n, cap, tile = 5000, 8, 128
    pts = jnp.asarray(rng.uniform(-15, 15, (n, 3)), jnp.float32)
    mask = jnp.asarray(rng.rand(n) > 0.05)
    ncx = ncy = 25
    srow, sy, sslot, sx, syc, sz, sidx, px, pyp = _sorted_stream(
        pts, mask, 0.5, ncx, ncy, cap)

    # a fake labels table: label = 3*ptidx + 7 (f32-exact), sentinel 0
    ref = ccl.build_planes(pts, mask, min_cell=0.5, ncx=ncx, ncy=ncy,
                           cap=cap)
    lab = jnp.where(ref.ptidx >= 0,
                    (3 * ref.ptidx + 7).astype(jnp.float32), 0.0)
    got = fill.extract_stream(lab, srow, sy, sslot, tile=tile)

    in_table = np.asarray(mask)[np.asarray(sidx, np.int32)] & (
        np.asarray(sslot) < cap)
    want = np.where(in_table, 3 * np.asarray(sidx) + 7, 0.0)
    np.testing.assert_array_equal(np.asarray(got), want.astype(np.float32))


def test_tile_schedule_covers_every_row_and_tile():
    rng = np.random.RandomState(2)
    srow = jnp.asarray(np.sort(rng.randint(0, 40, 1000)), jnp.int32)
    # pad tail like fill/extract do: two full tiles of out-of-range rows
    srow = jnp.concatenate([srow, jnp.full((24,), 42, jnp.int32),
                            jnp.full((256,), 42, jnp.int32)])
    g_row, g_block, g_first_row, g_first_blk, g_live = (
        np.asarray(a) for a in fill.tile_schedule(srow, 42, 10, tile=128))
    # rows non-decreasing, every row 0..41 initialised exactly once
    assert (np.diff(g_row) >= 0).all()
    assert g_first_row.sum() == 42
    assert set(g_row[g_first_row == 1]) == set(range(42))
    assert (g_block >= 0).all() and (g_block < 10).all()
    # every tile 0..9 initialised exactly once (incl. the padding tail)
    assert g_first_blk.sum() == 10
    assert set(g_block[g_first_blk == 1]) == set(range(10))
    # a tile is never revisited after the schedule moves past it
    seen_last = {}
    for i, b in enumerate(g_block[: (g_first_row.sum() and len(g_block))]):
        seen_last[b] = i
    for b, last_i in seen_last.items():
        firsts = np.where(g_block == b)[0]
        assert (np.diff(firsts) == 1).all() or len(firsts) == 1 or \
            set(np.diff(firsts)) <= {1}


def test_place_dense_exact_placement():
    rng = np.random.RandomState(3)
    n, k = 4000, 700
    # sorted non-decreasing segment ids; one "end" row per segment
    ids = np.sort(rng.randint(0, k, n)).astype(np.int32)
    is_end = np.concatenate([ids[1:] != ids[:-1], [True]])
    vals = [rng.uniform(-1e4, 1e4, n).astype(np.float32),
            rng.randint(0, 1 << 24, n).astype(np.float32)]

    out, occ = fill.place_dense(jnp.asarray(ids), jnp.asarray(is_end),
                                [jnp.asarray(v) for v in vals], k,
                                lanes=256, tile=128)
    out, occ = np.asarray(out), np.asarray(occ)

    want = np.zeros((2, out.shape[1]), np.float32)
    wocc = np.zeros(out.shape[1], np.float32)
    for j in np.nonzero(is_end)[0]:
        want[0, ids[j]] = vals[0][j]
        want[1, ids[j]] = vals[1][j]
        wocc[ids[j]] = 1.0
    # exact: split3 recombination must be bit-perfect
    np.testing.assert_array_equal(out, want)
    np.testing.assert_array_equal(occ, wocc)


def test_split3_bf16_exact():
    rng = np.random.RandomState(4)
    v = jnp.asarray(np.concatenate([
        rng.uniform(-1e6, 1e6, 1000),
        rng.randint(0, 1 << 24, 1000).astype(np.float64),
        [0.0, 1.0, -1.0, 3.14159265, 1e-30]]), jnp.float32)
    b1, b2, b3 = fill.split3_bf16(v)
    back = (b1.astype(jnp.float32) + b2.astype(jnp.float32)
            + b3.astype(jnp.float32))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(v))
