"""Streaming column-table fill/extract as MXU dispatch-matmuls.

Round-4 profiling showed the CCL column-table BUILD — one XLA width-4
scatter of ~10.5M rows — costs ~1.0 s at 10M points (~20M rows/s,
scatter-latency-bound, ~1.6% of HBM roofline), and the label RETURN
(one ~10.5M-element gather from the 29M-slot table) costs a comparable
fraction.  TPU has no fast scatter/gather, but it has a 128x128 MXU:
this module re-expresses both data movements as ONE-HOT MATMULS over
tiles of the cell-sorted point stream — the same "dispatch einsum"
trick MoE routers use (Switch Transformer) to place tokens without a
scatter.

Layout recap (ops/ccl.py): the table is SoA planes ``(PX, CAP, PYP)``
(x-row, column slot, y-lane).  Points sorted by cell id are CONTIGUOUS
per x-row, so a flat grid of stream tiles — each tile assigned to one
output row, rows visited in ascending order, boundary tiles duplicated
— lets every kernel step compute

    C[s, y] += sum_k  v_k * [slot_k == s] * [y_k == y] * [row_k == row]

as an (5*CAP, T) @ (T, PYP) f32 matmul whose LHS carries the slot
one-hots times the 5 value lanes (x, y, z, point-index, occupancy) and
whose RHS carries the y one-hots.  Each (slot, y) receives at most one
point, so the sums are exact in f32 (point indices < 2^24 are f32
exact).  The tile->row schedule rides PrefetchScalarGridSpec: block
index maps read prefetched SMEM scalars — no data-dependent DMA
offsets, no in-kernel scalar VMEM loads (the two Mosaic constraints
that killed the round-4 streaming-fill prototypes).

The EXTRACT direction (labels back to stream order) is the transposed
product: tmp = Lb @ Yonehot^T, then a slot-select reduction on the VPU.

Replaces: the reference's per-point Python grid fill inside sklearn
DBSCAN (utils/data_processing.py:188-198) at TPU scale.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_T = 512  # stream tile length (lanes; multiple of 128)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def tile_schedule(srow_sorted: jnp.ndarray, px: int, n_tiles: int,
                  tile: int = _T
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                             jnp.ndarray]:
    """Flat (tile, row) visit schedule over the cell-sorted stream.

    For each output x-row r (ascending), visit every stream tile that
    holds one of its points — boundary tiles are visited once per row
    they straddle; empty rows get one (fully masked) visit so their
    output block is still initialised.  Schedule padding then walks any
    trailing tiles no row touched (tiles of mask-padding points) under
    the empty top border row, so tile-indexed outputs (extract) are
    fully initialised too.  Returns int32 arrays of static length
    G = n_tiles + px + 8:

      g_row       output x-row of this visit
      g_block     stream-tile index of this visit
      g_first_row 1 on the first visit of each row (fill: block init)
      g_first_blk 1 on the first visit of each tile (extract: acc init)
      g_live      0 on schedule-padding entries: their contributions
                  must be dead even when their (row, block) pair would
                  match real rows (the pad row px-1 is an empty border
                  in the CCL table, but place_dense's last row is real)
    """
    g_max = n_tiles + px + 8
    rows = jnp.arange(px + 1, dtype=jnp.int32)
    row_start = jnp.searchsorted(srow_sorted, rows).astype(jnp.int32)
    count = row_start[1:] - row_start[:-1]                    # (px,)
    start_blk = row_start[:-1] // tile
    end_blk = jnp.where(count > 0, (row_start[1:] - 1) // tile,
                        start_blk)
    span = jnp.where(count > 0, end_blk - start_blk + 1, 1)
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(span, dtype=jnp.int32)])
    g_total = offsets[-1]
    maxblk = jnp.max(jnp.where(count > 0, end_blk, 0))

    gidx = jnp.arange(g_max, dtype=jnp.int32)
    row_of = jnp.clip(
        jnp.searchsorted(offsets, gidx, side="right").astype(jnp.int32)
        - 1, 0, px - 1)
    j = gidx - offsets[row_of]
    pad = gidx >= g_total
    # padding entries continue under the last row (px-1: the empty top
    # border row — no point has it, so contributions stay masked) and
    # sweep the uncovered tile tail once each
    pad_rank = gidx - g_total
    pad_blk_raw = maxblk + 1 + pad_rank
    last = max(n_tiles - 1, 0)
    g_row = jnp.where(pad, px - 1, row_of)
    g_block = jnp.where(pad, jnp.clip(pad_blk_raw, 0, last),
                        jnp.clip(start_blk[row_of] + j, 0, last))
    g_first_row = ((j == 0) & ~pad).astype(jnp.int32)
    prev_blk = jnp.concatenate([jnp.full((1,), -1, jnp.int32),
                                g_block[:-1]])
    # pad entries init a block only when it is genuinely new (unclamped
    # index in range): a clamped duplicate must never re-init the final
    # tile, which can hold real points when maxblk == n_tiles-1
    g_first_blk = jnp.where(
        pad, (pad_blk_raw <= last) & (pad_blk_raw > maxblk),
        g_block != prev_blk).astype(jnp.int32)
    g_live = (~pad).astype(jnp.int32)
    return g_row, g_block, g_first_row, g_first_blk, g_live


# ---------------------------------------------------------------------------
# fill: sorted stream -> (PX, 5*CAP, PYP) accumulator planes
# ---------------------------------------------------------------------------

def _fill_kernel(cap: int, gr, gb, gfr, gfb, glive,
                 srow, sy, sslot, *refs):
    # refs: 12 split value streams (4 channels x 3 exact bf16 terms,
    # shipped as f32 — bf16 (1,T) blocks corrupt on device) + out_ref
    ch_refs = refs[:12]
    out_ref = refs[12]
    g = pl.program_id(0)
    row = jnp.where(glive[g] == 1, gr[g], -1)   # -1 matches no point

    # everything stays lane-major ((1, T) stream views): the y one-hot
    # is built TRANSPOSED (PYP, T) so no (T, 1) relayouts/padded HBM
    # views are ever needed, and the contraction runs over the lane dim
    # of both operands (an "NT" matmul the MXU feeds natively)
    t = srow.shape[2]
    pyp = out_ref.shape[2]
    inrow = srow[0] == row                                    # (1, T)
    iota_y = jax.lax.broadcasted_iota(jnp.int32, (pyp, t), 0)
    rhs_t = jnp.where((iota_y == sy[0]) & inrow,
                      1.0, 0.0).astype(jnp.bfloat16)          # (PYP, T)

    # (13*CAP, T) LHS: slot one-hot scaled by the 12 split value terms
    # + one occupancy group.  The TPU's DEFAULT matmul precision is
    # single-pass bf16 (it silently truncated coords and point indices
    # to 8 mantissa bits at 10M); riding each f32 value as an exact
    # 3-way bf16 split keeps single-pass speed with exact results
    # (split3_bf16 — one contribution per slot, f32 recombination).
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (cap, t), 0)
    onehot = jnp.where(iota_s == sslot[0],
                       1.0, 0.0).astype(jnp.bfloat16)         # (CAP, T)
    lhs = jnp.concatenate(
        [onehot * r[0].astype(jnp.bfloat16) for r in ch_refs]
        + [onehot], axis=0)

    big = jax.lax.dot_general(
        lhs, rhs_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (13CAP, PYP)
    parts = [big[i * cap:(i + 1) * cap] for i in range(13)]
    contrib = jnp.concatenate(
        [parts[3 * c] + parts[3 * c + 1] + parts[3 * c + 2]
         for c in range(4)] + [parts[12]], axis=0)           # (5CAP, PYP)

    @pl.when(gfr[g] == 1)
    def _():
        out_ref[0] = contrib

    @pl.when(gfr[g] == 0)
    def _():
        out_ref[0] = out_ref[0] + contrib


def fill_planes(srow: jnp.ndarray, sy: jnp.ndarray, sslot: jnp.ndarray,
                sx: jnp.ndarray, syc: jnp.ndarray, sz: jnp.ndarray,
                sidx: jnp.ndarray, px: int, cap: int, pyp: int,
                tile: int = _T) -> jnp.ndarray:
    """Build the (PX, 5*CAP, PYP) f32 accumulator from the cell-sorted
    stream (all inputs (N,) in sorted order; padding rows carry
    srow >= px).  Slices [p*CAP:(p+1)*CAP] hold x, y, z, point-index and
    occupancy; unoccupied slots are exactly 0 in every plane, occupied
    ones carry the single contributing point's values exactly."""
    n = srow.shape[0]
    n_pad = _round_up(max(n, tile), tile)
    n_tiles = n_pad // tile

    def pad1(a, fill):
        return jnp.pad(a, (0, n_pad - n), constant_values=fill)

    srow_p = pad1(srow, px)
    sy_p = pad1(sy, 0)
    sslot_p = pad1(sslot, cap)      # >= cap: never matches the one-hot
    sx_p, syc_p, sz_p, sidx_p = (pad1(a, 0.0)
                                 for a in (sx, syc, sz, sidx))

    g_row, g_block, g_first_row, g_first_blk, g_live = tile_schedule(
        srow_p, px, n_tiles, tile)

    def in_l(a):        # (n_tiles, 1, T) — stream values on lanes
        return a.reshape(n_tiles, 1, tile)

    blk = lambda: pl.BlockSpec(
        (1, 1, tile), lambda g, gr, gb, gfr, gfb, gl: (gb[g], 0, 0),
        memory_space=pltpu.VMEM)

    split_streams = []
    for v in (sx_p, syc_p, sz_p, sidx_p):
        split_streams.extend(
            b.astype(jnp.float32) for b in split3_bf16(v))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(g_row.shape[0],),
        in_specs=[blk() for _ in range(3 + 12)],
        out_specs=pl.BlockSpec(
            (1, 5 * cap, pyp),
            lambda g, gr, gb, gfr, gfb, gl: (gr[g], 0, 0),
            memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_fill_kernel, cap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((px, 5 * cap, pyp), jnp.float32),
        interpret=_interpret(),
    )(g_row, g_block, g_first_row, g_first_blk, g_live,
      in_l(srow_p), in_l(sy_p), in_l(sslot_p),
      *[in_l(c) for c in split_streams])


# ---------------------------------------------------------------------------
# extract: (PX, CAP, PYP) labels -> stream order
# ---------------------------------------------------------------------------

def _extract_kernel(cap: int, gr, gb, gfr, gfb, glive,
                    srow, sy, sslot, la_ref, lb_ref, lc_ref,
                    out_ref, acc_ref):
    g = pl.program_id(0)
    row = jnp.where(glive[g] == 1, gr[g], -1)   # -1 matches no point
    t = srow.shape[2]
    pyp = la_ref.shape[2]

    # lane-native throughout: yhot is built transposed (PYP, T), the
    # matmuls are standard (CAP, PYP) @ (PYP, T), and the slot-select
    # reduction collapses sublanes into a (1, T) lane vector.  The
    # label rides as THREE byte planes (exact in bf16) so every matmul
    # is single-pass bf16 instead of the ~6-pass HIGHEST f32
    # decomposition; the one-contribution-per-slot sums recombine
    # exactly in f32 (each byte term <= 255, scaled <= 2^24).
    inrow = srow[0] == row                                    # (1, T)
    iota_y = jax.lax.broadcasted_iota(jnp.int32, (pyp, t), 0)
    yhot_t = jnp.where((iota_y == sy[0]) & inrow,
                       1.0, 0.0).astype(jnp.bfloat16)         # (PYP, T)

    tmp_t = jnp.zeros((cap, t), jnp.float32)
    for ref, scale in ((la_ref, 65536.0), (lb_ref, 256.0),
                       (lc_ref, 1.0)):
        part = jax.lax.dot(ref[0].astype(jnp.bfloat16), yhot_t,
                           preferred_element_type=jnp.float32)
        tmp_t = tmp_t + part * scale                          # (CAP, T)

    iota_s = jax.lax.broadcasted_iota(jnp.int32, (cap, t), 0)
    picked = jnp.where(iota_s == sslot[0], tmp_t, 0.0)
    val = jnp.sum(picked, axis=0, keepdims=True)              # (1, T)
    val = jnp.where(inrow, val, 0.0)

    @pl.when(gfb[g] == 1)
    def _():
        acc_ref[...] = val

    @pl.when(gfb[g] == 0)
    def _():
        acc_ref[...] = acc_ref[...] + val

    out_ref[...] = acc_ref[...][None]


def extract_stream(labels_f32: jnp.ndarray, srow: jnp.ndarray,
                   sy: jnp.ndarray, sslot: jnp.ndarray,
                   tile: int = _T) -> jnp.ndarray:
    """Read labels back in stream order: out[k] = labels[srow_k,
    slot_k, y_k] (f32 ride; padding / overflow positions return 0).
    ``labels_f32`` is (PX, CAP, PYP) float32 with values < 2^24."""
    px, cap, pyp = labels_f32.shape
    n = srow.shape[0]
    n_pad = _round_up(max(n, tile), tile)
    n_tiles = n_pad // tile

    srow_p = jnp.pad(srow, (0, n_pad - n), constant_values=px)
    sy_p = jnp.pad(sy, (0, n_pad - n))
    sslot_p = jnp.pad(sslot, (0, n_pad - n), constant_values=cap)

    g_row, g_block, g_first_row, g_first_blk, g_live = tile_schedule(
        srow_p, px, n_tiles, tile)

    def in_l(a):
        return a.reshape(n_tiles, 1, tile)

    blk = lambda: pl.BlockSpec(
        (1, 1, tile), lambda g, gr, gb, gfr, gfb, gl: (gb[g], 0, 0),
        memory_space=pltpu.VMEM)

    # split labels into byte planes OUTSIDE the kernel (values < 2^24,
    # exact; integer ops, immune to excess-precision folding)
    lab_int = labels_f32.astype(jnp.int32)
    la = ((lab_int >> 16) & 0xFF).astype(jnp.float32)
    lb = ((lab_int >> 8) & 0xFF).astype(jnp.float32)
    lc = (lab_int & 0xFF).astype(jnp.float32)

    lab_spec = lambda: pl.BlockSpec(
        (1, cap, pyp), lambda g, gr, gb, gfr, gfb, gl: (gr[g], 0, 0),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(g_row.shape[0],),
        in_specs=[blk(), blk(), blk(),
                  lab_spec(), lab_spec(), lab_spec()],
        out_specs=pl.BlockSpec(
            (1, 1, tile),
            lambda g, gr, gb, gfr, gfb, gl: (gb[g], 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, tile), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_extract_kernel, cap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.float32),
        interpret=_interpret(),
    )(g_row, g_block, g_first_row, g_first_blk, g_live,
      in_l(srow_p), in_l(sy_p), in_l(sslot_p), la, lb, lc)
    return out.reshape(n_pad)[:n]


# ---------------------------------------------------------------------------
# place_dense: monotone placement of per-row channels into K dense slots
# ---------------------------------------------------------------------------

def split3_bf16(v: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray,
                                         jnp.ndarray]:
    """Exact 3-way bf16 split: v == b1 + b2 + b3 for every f32 (24
    significand bits <= 3 x 8; each residual cancellation is exact).
    Lets placement matmuls run single-pass bf16 (DEFAULT precision)
    instead of the ~6-pass HIGHEST f32 decomposition.

    The rounding MUST go through ``lax.reduce_precision``: with
    ``--xla_allow_excess_precision`` (set on this TPU toolchain) XLA
    folds ``v - f32(bf16(v))`` to zero, silently collapsing the split
    to plain bf16 (caught on device: every placed value truncated;
    reduce_precision is contractually un-foldable)."""
    def rp(x):
        return jax.lax.reduce_precision(x, exponent_bits=8,
                                        mantissa_bits=7)

    b1 = rp(v)
    r1 = v - b1
    b2 = rp(r1)
    b3 = rp(r1 - b2)
    return (b1.astype(jnp.bfloat16), b2.astype(jnp.bfloat16),
            b3.astype(jnp.bfloat16))


def _place_kernel(nch: int, gr, gb, gfr, gfb, glive, sid, svalid,
                  *refs):
    ch_refs = refs[:3 * nch]
    out_ref = refs[3 * nch]
    g = pl.program_id(0)
    row = jnp.where(glive[g] == 1, gr[g], -1)   # -1 matches no id
    t = sid.shape[2]
    pyl = out_ref.shape[2]

    live = (svalid[0] != 0) & ((sid[0] // pyl) == row)         # (1, T)
    iota_y = jax.lax.broadcasted_iota(jnp.int32, (pyl, t), 0)
    rhs_t = jnp.where((iota_y == sid[0] % pyl) & live,
                      1.0, 0.0).astype(jnp.bfloat16)           # (PYL, T)

    # channels arrive as f32 (bf16 (1, T) stream blocks corrupted
    # values on real TPU — pair-packed sublane layout; measured: half
    # of all placed values wrong at every scale) and are cast here
    lhs = jnp.concatenate(
        [r[0].astype(jnp.bfloat16) for r in ch_refs]
        + [jnp.where(live, 1.0, 0.0).astype(jnp.bfloat16)], axis=0)

    contrib = jax.lax.dot_general(
        lhs, rhs_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)     # (3*nch+1, PYL)

    @pl.when(gfr[g] == 1)
    def _():
        out_ref[0] = contrib

    @pl.when(gfr[g] == 0)
    def _():
        out_ref[0] = out_ref[0] + contrib


def place_dense(ids: jnp.ndarray, valid: jnp.ndarray,
                channels, k: int, lanes: int = 512,
                tile: int = _T) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """out[c, id] = channels[c][j] for the unique j with valid[j] and
    ids[j] == id — a monotone scatter of at most one row per dense slot,
    as dispatch matmuls (``ids`` must be NON-DECREASING; callers feed
    cell/segment-sorted streams).  Invalid rows contribute nothing; ids
    of invalid rows still participate in the visit schedule, so they
    must carry their neighborhood's id (e.g. their segment), keeping the
    sequence monotone.  Returns (out (C, K') f32, occupancy (K',) f32)
    with K' = k rounded up to ``lanes``; slots no row hit are 0.

    Exactness: each channel rides as an exact 3-way bf16 split
    (``split3_bf16``) against a one-hot RHS, single contribution per
    slot, f32 accumulate — bit-exact reconstruction, single-pass bf16
    matmul speed."""
    channels = list(channels)
    nch = len(channels)
    n = ids.shape[0]
    kp = _round_up(max(k, lanes), lanes)
    rows = kp // lanes
    n_pad = _round_up(max(n, tile), tile)
    n_tiles = n_pad // tile

    ids_p = jnp.pad(jnp.clip(ids, 0, kp - 1), (0, n_pad - n))
    ids_p = jnp.where(
        jnp.pad(valid, (0, n_pad - n)) | (jnp.arange(n_pad) < n),
        ids_p, kp - 1)
    # schedule rows from the id stream (monotone); mask-padding tail
    # rides the last row and is invalid
    srow = ids_p // lanes
    srow = jnp.where(jnp.arange(n_pad) < n, srow, rows)
    valid_p = jnp.pad(valid, (0, n_pad - n)).astype(jnp.int32)

    g_row, g_block, g_first_row, g_first_blk, g_live = tile_schedule(
        srow, rows, n_tiles, tile)

    def in_l(a):
        return a.reshape(n_tiles, 1, tile)

    split_chs = []
    for c in channels:
        split_chs.extend(
            b.astype(jnp.float32) for b in split3_bf16(
                jnp.pad(c.astype(jnp.float32), (0, n_pad - n))))

    blk = lambda: pl.BlockSpec(
        (1, 1, tile), lambda g, gr, gb, gfr, gfb, gl: (gb[g], 0, 0),
        memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(g_row.shape[0],),
        in_specs=[blk() for _ in range(2 + 3 * nch)],
        out_specs=pl.BlockSpec(
            (1, 3 * nch + 1, lanes),
            lambda g, gr, gb, gfr, gfb, gl: (gr[g], 0, 0),
            memory_space=pltpu.VMEM),
    )
    acc = pl.pallas_call(
        functools.partial(_place_kernel, nch),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, 3 * nch + 1, lanes),
                                       jnp.float32),
        interpret=_interpret(),
    )(g_row, g_block, g_first_row, g_first_blk, g_live,
      in_l(ids_p), in_l(valid_p), *[in_l(c) for c in split_chs])

    # (rows, 3nch+1, lanes) -> recombined (nch, K'), occupancy (K',)
    acc = jnp.swapaxes(acc, 0, 1).reshape(3 * nch + 1, kp)
    out = jnp.stack([acc[3 * c] + acc[3 * c + 1] + acc[3 * c + 2]
                     for c in range(nch)], axis=0)
    return out, acc[3 * nch]
