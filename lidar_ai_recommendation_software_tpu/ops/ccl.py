"""Gauss-Seidel connected-component labeling on the column grid (Pallas).

The DBSCAN-equivalent clustering (ops/clustering.py) spends its time in
label-propagation sweeps. The jnp path is Jacobi: every sweep reads the
previous sweep's labels, so a label travels ONE column-hop per sweep and
long components (terrain sheets spanning the venue) need ~15 sweeps plus
expensive pointer-jumping gathers (~113 ms per round at 1M points: TPU
gathers run ~18M elem/s).

This module exploits the fact that a TPU Pallas grid executes
SEQUENTIALLY on a core: processing grid rows in order and letting each
row read the rows just updated (Gauss-Seidel) lets a label cross the
entire venue in a single pass. Alternating forward/backward passes over
x, and transposed passes over y, converge in ~4-8 passes with NO
pointer jumping at all. Min-propagation is a lattice fixpoint, so any
update order yields the same final labels as the Jacobi reference — a
pass that changes nothing certifies global convergence.

Data layout (SoA, y-on-lanes): coordinate planes ``(PX, CAP, PYP)``
float32 where PX = ncx+2 (one border row each side), CAP = column slot
capacity (multiple of 8 — sublanes), PYP = ncy+2 rounded up to 128
(lanes). Empty slots hold EMPTY_COORD / -1 — the distance test rejects
them with no mask input. Labels are int32 point indices with INT_MAX
for non-core/empty — non-core neighbors never win a min, so no core
mask is needed in the kernel either.

The table is built WITHOUT a scatter (``build_planes_stream``): one
5-lane sort by cell id, then the dispatch-matmul fill kernel
(ops/pallas/fill.py) places the cell-sorted stream onto the planes via
one-hot MXU products — r5 measured 157 ms vs 813 ms for the width-4
XLA scatter at 8.4M points; labels return through the transposed
extract matmul + one unsort sort (68 ms vs a 137 ms gather). The
scatter build (``build_planes``) remains for n >= 2^24, where point
indices stop being f32-exact.

Kernels:
  - ``column_counts_planes``: Jacobi eps-neighbor counts (core test).
  - ``_gs_kernel_blocked``: multi-pass Gauss-Seidel min-propagation;
    labels live in HBM, each program DMAs an (rpb+2)-row window,
    updates its rpb rows sequentially in VMEM, writes them back before
    the next program reads, and SKIPS entirely when its neighborhood
    reported no changes in the previous pass (the convergence tail is
    long: measured 1.9M changed slots in pass 1, six in pass 11).
  - ``border_min_planes``: one Jacobi pass reading converged labels
    (border points adopt the min core-neighbor label).

Reference equivalence: fixpoint identical to ops/clustering.dbscan_columns
(tested); census identical to sklearn DBSCAN (cluster.py docstring).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT_MAX = jnp.iinfo(jnp.int32).max
EMPTY_COORD = 1.0e18          # (1e18)^2 = 1e36 < f32 max, always > r^2


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class ColumnPlanes:
    """SoA column table: coords + point-index planes, (PX, CAP, PYP)."""

    xs: jnp.ndarray        # (PX, CAP, PYP) f32, EMPTY_COORD when empty
    ys: jnp.ndarray
    zs: jnp.ndarray
    ptidx: jnp.ndarray     # (PX, CAP, PYP) int32, -1 when empty
    point_pos: jnp.ndarray  # (N,) flat position into planes (or spill)
    cell: jnp.ndarray      # () cell edge >= query radius
    origin: jnp.ndarray    # (2,)
    overflow: jnp.ndarray  # () int32


@struct.dataclass
class StreamPlanes:
    """Column table built from the cell-sorted stream (ops/pallas/fill):
    same (PX, CAP, PYP) planes, plus the sorted stream coordinates that
    let labels ride BACK out of the table through the extract matmul +
    one unsort sort — no point_pos gather."""

    xs: jnp.ndarray        # (PX, CAP, PYP) f32, EMPTY_COORD when empty
    ys: jnp.ndarray
    zs: jnp.ndarray
    ptidx: jnp.ndarray     # (PX, CAP, PYP) int32, -1 when empty
    srow: jnp.ndarray      # (N,) sorted-stream x-row (px when masked)
    sy: jnp.ndarray        # (N,) sorted-stream y-lane
    slots: jnp.ndarray     # (N,) sorted-stream slot rank
    sidx: jnp.ndarray      # (N,) sorted-stream original point index
    cell: jnp.ndarray      # () cell edge >= query radius
    origin: jnp.ndarray    # (2,)
    overflow: jnp.ndarray  # () int32


def build_planes_stream(points: jnp.ndarray, mask: jnp.ndarray,
                        min_cell: float, ncx: int, ncy: int,
                        cap: int) -> StreamPlanes:
    """Pack padded points into SoA column planes WITHOUT a scatter: one
    5-lane sort by cell id, then the dispatch-matmul fill kernel
    (ops/pallas/fill.py).  Requires n < 2^24 (point indices ride the
    MXU as exact f32).  ~5x faster than the width-4 XLA scatter build
    at venue scale (measured r5 at 8.4M points on v5e: 157 ms at
    HIGHEST matmul precision vs 811 ms for the scatter)."""
    n, d = points.shape
    assert n < (1 << 24), "stream build needs f32-exact point indices"
    dt = points.dtype
    big = jnp.asarray(jnp.finfo(dt).max, dt)
    pmin = jnp.min(jnp.where(mask[:, None], points[:, :2], big), axis=0)
    pmax = jnp.max(jnp.where(mask[:, None], points[:, :2], -big), axis=0)
    cell = jnp.maximum(
        jnp.asarray(min_cell, dt),
        jnp.maximum((pmax[0] - pmin[0]) / (ncx - 1e-3),
                    (pmax[1] - pmin[1]) / (ncy - 1e-3)))

    cx = jnp.clip(jnp.floor((points[:, 0] - pmin[0]) / cell).astype(
        jnp.int32), 0, ncx - 1)
    cy = jnp.clip(jnp.floor((points[:, 1] - pmin[1]) / cell).astype(
        jnp.int32), 0, ncy - 1)
    px = ncx + 2
    pyp = _round_up(ncy + 2, 128)
    ncells = px * pyp
    cid = jnp.where(mask, (cx + 1) * pyp + (cy + 1), ncells)

    i32 = jnp.arange(n, dtype=jnp.int32)
    scid, sxf, syf, szf, sidxf = jax.lax.sort(
        (cid, points[:, 0].astype(jnp.float32),
         points[:, 1].astype(jnp.float32),
         points[:, 2].astype(jnp.float32),
         i32.astype(jnp.float32)), num_keys=1)
    is_start = jnp.concatenate([
        jnp.ones((1,), bool), scid[1:] != scid[:-1]])
    first = jax.lax.cummax(jnp.where(is_start, i32, 0))
    slots = i32 - first
    srow = jnp.minimum(scid // pyp, px)          # px == masked padding
    syl = jnp.where(srow < px, scid % pyp, 0)
    overflow = jnp.sum(((scid < ncells)
                        & (slots >= cap)).astype(jnp.int32))

    from lidar_ai_recommendation_software_tpu.ops.pallas import fill

    acc = fill.fill_planes(srow, syl, slots, sxf, syf, szf, sidxf,
                           px, cap, pyp)
    occ = acc[:, 4 * cap:] > 0.5
    empty = jnp.asarray(EMPTY_COORD, jnp.float32)
    xs = jnp.where(occ, acc[:, :cap], empty)
    ys = jnp.where(occ, acc[:, cap:2 * cap], empty)
    zs = jnp.where(occ, acc[:, 2 * cap:3 * cap], empty)
    ptidx = jnp.where(occ, acc[:, 3 * cap:4 * cap].astype(jnp.int32), -1)
    return StreamPlanes(
        xs=xs, ys=ys, zs=zs, ptidx=ptidx,
        srow=srow, sy=syl, slots=slots,
        sidx=sidxf.astype(jnp.int32),
        cell=cell, origin=pmin, overflow=overflow)


def build_planes(points: jnp.ndarray, mask: jnp.ndarray, min_cell: float,
                 ncx: int, ncy: int, cap: int) -> ColumnPlanes:
    """Pack padded points into SoA column planes (one sort + scatters, as
    ops/columns.build_column_grid but in kernel layout)."""
    n, d = points.shape
    dt = points.dtype
    big = jnp.asarray(jnp.finfo(dt).max, dt)
    pmin = jnp.min(jnp.where(mask[:, None], points[:, :2], big), axis=0)
    pmax = jnp.max(jnp.where(mask[:, None], points[:, :2], -big), axis=0)
    cell = jnp.maximum(
        jnp.asarray(min_cell, dt),
        jnp.maximum((pmax[0] - pmin[0]) / (ncx - 1e-3),
                    (pmax[1] - pmin[1]) / (ncy - 1e-3)))

    cx = jnp.clip(jnp.floor((points[:, 0] - pmin[0]) / cell).astype(
        jnp.int32), 0, ncx - 1)
    cy = jnp.clip(jnp.floor((points[:, 1] - pmin[1]) / cell).astype(
        jnp.int32), 0, ncy - 1)
    px = ncx + 2
    pyp = _round_up(ncy + 2, 128)
    ncells = px * pyp
    cid = jnp.where(mask, (cx + 1) * pyp + (cy + 1), ncells)

    # slot = rank within column via one sort (see build_column_grid);
    # the rank returns to point order through ANOTHER sort
    # (permutation_scatter, ~12 ms at 1M) rather than an XLA scatter
    # (~50 ms — TPU scatter runs ~20M elem/s, sort ~85M keys/s).
    from lidar_ai_recommendation_software_tpu.ops.pallas import permute

    order = jnp.argsort(cid).astype(jnp.int32)
    sorted_cid = cid[order]
    i32 = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([
        jnp.ones((1,), bool), sorted_cid[1:] != sorted_cid[:-1]])
    first = jax.lax.cummax(jnp.where(is_start, i32, 0))
    slots = permute.permutation_scatter(order, i32 - first)

    spill = px * cap * pyp
    # flat layout (PX, CAP, PYP): row-major x, then slot, then y-lane
    # (cx+1 = cid//pyp, cy+1 = cid%pyp)
    flat = jnp.where(
        mask & (slots < cap),
        ((cid // pyp) * cap + slots) * pyp + cid % pyp, spill)
    overflow = jnp.sum((mask & (slots >= cap)).astype(jnp.int32))

    # One fused width-4 scatter builds the whole table: x, y, z, and the
    # point index as a float VALUE in the 4th lane (f32 is exact for
    # ints < 2^24 — NOT a bitcast: small-int bit patterns are denormals
    # and the TPU flushes denormals to zero, which silently zeroed every
    # index). Empty rows keep the 0xFFFFFFFF fill: NaN in the coord
    # lanes (distance tests reject) and NaN in the index lane (mapped to
    # -1 below).
    if n <= (1 << 24):
        payload = jnp.concatenate(
            [points.astype(jnp.float32),
             i32.astype(jnp.float32)[:, None]], axis=1)
        tab0 = jax.lax.bitcast_convert_type(
            jnp.full((spill + 1, d + 1), -1, jnp.int32), jnp.float32)
        table = tab0.at[flat].set(payload)[:spill].reshape(
            px, cap, pyp, d + 1)
        lane = table[..., 3]
        ptidx = jnp.where(jnp.isnan(lane), -1,
                          lane.astype(jnp.int32))
        xs, ys, zs = table[..., 0], table[..., 1], table[..., 2]
    else:
        # beyond f32-exact integer range: separate int scatter
        coords = jax.lax.bitcast_convert_type(
            jnp.full((spill + 1, d), -1, jnp.int32),
            jnp.float32).at[flat].set(points.astype(jnp.float32))
        pti = jnp.full((spill + 1,), -1, jnp.int32).at[flat].set(i32)
        shape = (px, cap, pyp)
        xs = coords[:spill, 0].reshape(shape)
        ys = coords[:spill, 1].reshape(shape)
        zs = coords[:spill, 2].reshape(shape)
        ptidx = pti[:spill].reshape(shape)

    return ColumnPlanes(
        xs=xs, ys=ys, zs=zs, ptidx=ptidx,
        point_pos=flat, cell=cell, origin=pmin, overflow=overflow)


def _row_inputs(arrs, ncx: int, row_of):
    """BlockSpecs delivering rows r-1, r, r+1 of each (PX, CAP, PYP) array
    as pipelined VMEM blocks."""
    specs = []
    operands = []
    for a in arrs:
        cap, pyp = a.shape[1], a.shape[2]
        for off in (0, 1, 2):
            specs.append(pl.BlockSpec(
                (1, cap, pyp),
                functools.partial(row_of, off=off),
                memory_space=pltpu.VMEM))
            operands.append(a)
    return specs, operands


def _neighbor_min_and_count(cx, cy, cz, planes3, r2, cap, want_min,
                            want_count):
    """Shared inner loop: for the center block (CAP, PYP), reduce over the
    3x3 neighborhood given ``planes3`` = per-row (kx, ky, kz[, klab]).
    Rolls along lanes implement the y offsets (wrap lands in padding whose
    coords are EMPTY_COORD, so wraparound cannot contaminate).

    (r5 note: an all-pairs (8, CAP, PYP) broadcast restructure was
    measured 2.4x SLOWER on v5e — Mosaic's 3-D broadcast materialisation
    costs more than the stream of small 2-D ops; keep the per-slot
    loop.)"""
    acc_min = jnp.full(cx.shape, INT_MAX, jnp.int32) if want_min else None
    acc_cnt = jnp.zeros(cx.shape, jnp.int32) if want_count else None
    for row_planes in planes3:
        kx0, ky0, kz0 = row_planes[0], row_planes[1], row_planes[2]
        kl0 = row_planes[3] if want_min else None
        for dy in (-1, 0, 1):
            if dy == 0:
                kx, ky, kz, kl = kx0, ky0, kz0, kl0
            else:
                # aligned[y] = k0[y+dy], i.e. roll right by -dy (mod lanes;
                # pltpu.roll requires a non-negative shift). Wraparound
                # lands in padding lanes whose coords are EMPTY_COORD.
                sh = (-dy) % kx0.shape[-1]
                kx = pltpu.roll(kx0, sh, 1)
                ky = pltpu.roll(ky0, sh, 1)
                kz = pltpu.roll(kz0, sh, 1)
                kl = pltpu.roll(kl0, sh, 1) if want_min else None
            for j in range(cap):
                dx_ = kx[j:j + 1, :] - cx
                dy_ = ky[j:j + 1, :] - cy
                dz_ = kz[j:j + 1, :] - cz
                d2 = dx_ * dx_ + dy_ * dy_ + dz_ * dz_
                hit = d2 <= r2
                if want_count:
                    acc_cnt = acc_cnt + hit.astype(jnp.int32)
                if want_min:
                    cand = jnp.where(hit, kl[j:j + 1, :], INT_MAX)
                    acc_min = jnp.minimum(acc_min, cand)
    return acc_min, acc_cnt


# ---------------------------------------------------------------------------
# counts kernel (Jacobi, pipelined)
# ---------------------------------------------------------------------------

def _counts_kernel(r2_ref, *refs):
    out_ref = refs[-1]
    xs = [refs[0 + k][0] for k in range(3)]
    ys = [refs[3 + k][0] for k in range(3)]
    zs = [refs[6 + k][0] for k in range(3)]
    cap = xs[0].shape[0]
    cx, cy, cz = xs[1], ys[1], zs[1]
    planes3 = [(xs[k], ys[k], zs[k]) for k in range(3)]
    _, cnt = _neighbor_min_and_count(cx, cy, cz, planes3, r2_ref[0],
                                     cap, False, True)
    out_ref[0] = cnt


def column_counts_planes(planes: ColumnPlanes, radius) -> jnp.ndarray:
    """Per-slot count of points within ``radius`` (self included) —
    (NCX, CAP, PYP) int32 (garbage where empty; callers gate on ptidx)."""
    px, cap, pyp = planes.xs.shape
    ncx = px - 2
    r2 = jnp.asarray([radius], planes.xs.dtype) ** 2

    def row_of(i, off):
        return (i + off, 0, 0)

    specs, operands = _row_inputs((planes.xs, planes.ys, planes.zs),
                                  ncx, row_of)
    return pl.pallas_call(
        _counts_kernel,
        grid=(ncx,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + specs,
        out_specs=pl.BlockSpec((1, cap, pyp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ncx, cap, pyp), jnp.int32),
        interpret=_interpret(),
    )(r2, *operands)


# ---------------------------------------------------------------------------
# border kernel (Jacobi over converged labels, pipelined)
# ---------------------------------------------------------------------------

def _border_kernel(r2_ref, *refs):
    out_ref = refs[-1]
    xs = [refs[0 + k][0] for k in range(3)]
    ys = [refs[3 + k][0] for k in range(3)]
    zs = [refs[6 + k][0] for k in range(3)]
    ls = [refs[9 + k][0] for k in range(3)]
    cap = xs[0].shape[0]
    planes3 = [(xs[k], ys[k], zs[k], ls[k]) for k in range(3)]
    mn, _ = _neighbor_min_and_count(xs[1], ys[1], zs[1], planes3,
                                    r2_ref[0], cap, True, False)
    out_ref[0] = mn


def border_min_planes(planes: ColumnPlanes, labels: jnp.ndarray,
                      radius) -> jnp.ndarray:
    """Min label among eps-neighbors (labels INT_MAX at non-core make this
    "min core-neighbor label") — (NCX, CAP, PYP) int32."""
    px, cap, pyp = planes.xs.shape
    ncx = px - 2
    r2 = jnp.asarray([radius], planes.xs.dtype) ** 2

    def row_of(i, off):
        return (i + off, 0, 0)

    specs, operands = _row_inputs(
        (planes.xs, planes.ys, planes.zs, labels), ncx, row_of)
    return pl.pallas_call(
        _border_kernel,
        grid=(ncx,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + specs,
        out_specs=pl.BlockSpec((1, cap, pyp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ncx, cap, pyp), jnp.int32),
        interpret=_interpret(),
    )(r2, *operands)


# ---------------------------------------------------------------------------
# Gauss-Seidel multi-pass kernel
# ---------------------------------------------------------------------------

def _gs_kernel(ncx: int, npass: int, r2_ref, *refs):
    # refs: 9 coord row-blocks, labels_in (ANY), labels_out (ANY),
    #       changed_out (SMEM), then scratch: lab3, newrow, sems
    (labels_in, labels_out, changed_ref, lab3, newrow,
     sem_in, sem_out, sem_copy) = refs[9:]
    p = pl.program_id(0)
    i = pl.program_id(1)
    fwd = (p % 2) == 0
    row = jnp.where(fwd, i + 1, ncx - i)

    @pl.when((p == 0) & (i == 0))
    def _():
        # seed the in-place buffer and zero the changed flags
        cp = pltpu.make_async_copy(labels_in, labels_out, sem_copy)
        cp.start()
        cp.wait()

    @pl.when(i == 0)
    def _():
        changed_ref[p, 0] = 0

    # 3-row label window (row-1 was finalised by the previous program —
    # the grid runs sequentially and every program waits on its write DMA)
    rd = pltpu.make_async_copy(
        labels_out.at[pl.ds(row - 1, 3)], lab3, sem_in)
    rd.start()
    rd.wait()

    xs = [refs[0 + k][0] for k in range(3)]
    ys = [refs[3 + k][0] for k in range(3)]
    zs = [refs[6 + k][0] for k in range(3)]
    cap = xs[0].shape[0]
    planes3 = [(xs[k], ys[k], zs[k], lab3[k]) for k in range(3)]
    mn, _ = _neighbor_min_and_count(xs[1], ys[1], zs[1], planes3,
                                    r2_ref[0], cap, True, False)
    center = lab3[1]
    new = jnp.where(center == INT_MAX, INT_MAX, jnp.minimum(center, mn))
    changed_ref[p, 0] = changed_ref[p, 0] + jnp.sum(
        (new != center).astype(jnp.int32))

    newrow[0] = new
    wr = pltpu.make_async_copy(newrow, labels_out.at[pl.ds(row, 1)],
                               sem_out)
    wr.start()
    wr.wait()


def _gs_kernel_blocked(ncx: int, rpb: int, seed_ref, r2_ref,
                       xs_h, ys_h, zs_h,
                       labels_in, labels_out, changed_ref, lanechg_ref,
                       xw, yw, zw, lw,
                       sem_x, sem_y, sem_z, sem_l, sem_out, sem_copy):
    """Blocked Gauss-Seidel pass: each program owns ``rpb`` consecutive
    interior rows, DMAs ONE (rpb+2)-row window of every plane, updates
    its rows sequentially in VMEM (same update order as the per-row
    kernel — identical fixpoint) and writes the rpb rows back.

    Activity skipping: ``changed_ref`` is (npass, nblk) — per-BLOCK
    change counts.  A block whose 3-block neighborhood reported no
    changes in the previous pass cannot change in this one (its input
    rows are untouched since it last converged — any intra-pass change
    next to it lands in a neighbor's count and reactivates it next
    pass), so it skips the window DMA and all compute.  Convergence is
    long-tailed (measured at 10M: 1.9M changed slots in pass 1, 6 in
    pass 11), so late passes cost ~grid overhead only, and a zero pass
    remains a true global-fixpoint certificate.

    Cross-call seeding: PASS 0 consults the prefetched ``seed_ref``
    (per-block activity from the caller) instead of running the whole
    grid, and ``lanechg_ref`` accumulates per-LANE change counts over
    the call — lanes of this orientation's table are exactly the
    ROWS of the transposed orientation, so the caller turns one call's
    lane changes into the next (transposed) call's block seeds.  A
    caller with no prior information passes all-ones seeds."""
    p = pl.program_id(0)
    i = pl.program_id(1)
    nblk = ncx // rpb
    fwd = (p % 2) == 0
    blk = jnp.where(fwd, i, nblk - 1 - i)
    blo = blk * rpb + 1

    @pl.when((p == 0) & (i == 0))
    def _():
        cp = pltpu.make_async_copy(labels_in, labels_out, sem_copy)
        cp.start()
        cp.wait()
        lanechg_ref[...] = jnp.zeros_like(lanechg_ref)

    prev = jnp.maximum(p - 1, 0)
    f_prev = (changed_ref[prev, jnp.maximum(blk - 1, 0)]
              + changed_ref[prev, blk]
              + changed_ref[prev, jnp.minimum(blk + 1, nblk - 1)])
    act = jnp.where(p == 0, seed_ref[blk] > 0, f_prev > 0)
    changed_ref[p, blk] = 0

    @pl.when(act)
    def _():
        copies = []
        for src, dst, sem in ((xs_h, xw, sem_x), (ys_h, yw, sem_y),
                              (zs_h, zw, sem_z), (labels_out, lw, sem_l)):
            cp = pltpu.make_async_copy(src.at[pl.ds(blo - 1, rpb + 2)],
                                       dst, sem)
            cp.start()
            copies.append(cp)
        for cp in copies:
            cp.wait()

        r2 = r2_ref[0]
        cap = xw.shape[1]

        # fori_loop with dynamic scratch-row indexing, NOT a Python
        # unroll: unrolling rpb x 9 x CAP iterations lowered a ~2.4 MB
        # Mosaic module and killed the AOT compiler at 10M.
        def body(j, c):
            jj = jnp.where(fwd, 1 + j, rpb - j)
            planes3 = [(xw[jj + d], yw[jj + d], zw[jj + d], lw[jj + d])
                       for d in (-1, 0, 1)]
            mn, _ = _neighbor_min_and_count(xw[jj], yw[jj], zw[jj],
                                            planes3, r2, cap, True,
                                            False)
            center = lw[jj]
            new = jnp.where(center == INT_MAX, INT_MAX,
                            jnp.minimum(center, mn))
            lw[jj] = new
            diff = (new != center).astype(jnp.int32)
            lanechg_ref[...] = lanechg_ref[...] + jnp.sum(
                diff, axis=0, keepdims=True)
            return c + jnp.sum(diff)

        c = jax.lax.fori_loop(0, rpb, body, jnp.int32(0))
        changed_ref[p, blk] = c

        wr = pltpu.make_async_copy(lw.at[pl.ds(1, rpb)],
                                   labels_out.at[pl.ds(blo, rpb)],
                                   sem_out)
        wr.start()
        wr.wait()


def _pick_rpb(ncx: int, cap: int, pyp: int) -> int:
    """Largest GS block size that divides ncx and keeps the 4 windows in
    a VMEM budget (~6 MB); 1 (per-row kernel) in interpret mode, where
    the blocked kernel's trace is disproportionately slow."""
    if _interpret():
        return 1
    budget = 6 * 1024 * 1024
    for cand in (16, 8, 4, 2):
        if ncx % cand == 0 and 4 * (cand + 2) * cap * pyp * 4 <= budget:
            return cand
    return 1


def gs_passes(planes_xyz: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
              labels: jnp.ndarray, radius, npass: int = 2,
              rows_per_block: int = 0, seed_blocks=None
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run ``npass`` alternating (fwd, bwd) Gauss-Seidel min-propagation
    passes over the sequential x axis. Returns (labels', changed) where
    ``changed`` is (npass, B) per-pass per-block change counts (B = 1
    for the per-row kernel) — an all-zero LAST row certifies the global
    fixpoint for this direction set.

    ``rows_per_block`` > 1 selects the blocked kernel (same fixpoint;
    activity-skipping makes late long-tail passes nearly free); 0
    auto-picks on TPU and stays per-row in interpret mode, where the
    blocked kernel's trace is disproportionately slow.

    ``seed_blocks`` ((nblk,) int32 or None) gates PASS 0 of the
    blocked kernel: callers pass the previous same-orientation call's
    last-pass block changes + the intervening transposed call's lane
    changes (reduced to blocks); None means all-active.  Third return
    value is the per-LANE change count over the whole call ((pyp,)
    int32; all-ones from the per-row fallback, which never skips)."""
    xs, ys, zs = planes_xyz
    px, cap, pyp = xs.shape
    ncx = px - 2
    r2 = jnp.asarray([radius], xs.dtype) ** 2

    rpb = rows_per_block or _pick_rpb(ncx, cap, pyp)

    if rpb > 1:
        nblk = ncx // rpb
        if seed_blocks is None:
            seed_blocks = jnp.ones((nblk,), jnp.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(npass, nblk),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
            out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pltpu.SMEM),
                       pl.BlockSpec((1, pyp), lambda p, i, sd: (0, 0),
                                    memory_space=pltpu.VMEM)),
            scratch_shapes=[
                pltpu.VMEM((rpb + 2, cap, pyp), xs.dtype),
                pltpu.VMEM((rpb + 2, cap, pyp), xs.dtype),
                pltpu.VMEM((rpb + 2, cap, pyp), xs.dtype),
                pltpu.VMEM((rpb + 2, cap, pyp), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        labels_out, changed, lanechg = pl.pallas_call(
            functools.partial(_gs_kernel_blocked, ncx, rpb),
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((px, cap, pyp), jnp.int32),
                       jax.ShapeDtypeStruct((npass, nblk), jnp.int32),
                       jax.ShapeDtypeStruct((1, pyp), jnp.int32)),
            interpret=_interpret(),
        )(seed_blocks.astype(jnp.int32), r2, xs, ys, zs, labels)
        return labels_out, changed, lanechg[0]

    def row_of(p, i, off):
        fwd_row = i + off
        bwd_row = ncx - 1 - i + off
        return (jnp.where(p % 2 == 0, fwd_row, bwd_row), 0, 0)

    specs = []
    operands = []
    for a in (xs, ys, zs):
        for off in (0, 1, 2):
            specs.append(pl.BlockSpec(
                (1, cap, pyp), functools.partial(row_of, off=off),
                memory_space=pltpu.VMEM))
            operands.append(a)

    labels_out, changed = pl.pallas_call(
        functools.partial(_gs_kernel, ncx, npass),
        grid=(npass, ncx),
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] + specs
                  + [pl.BlockSpec(memory_space=pl.ANY)]),
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((px, cap, pyp), jnp.int32),
                   jax.ShapeDtypeStruct((npass, 1), jnp.int32)),
        scratch_shapes=[
            pltpu.VMEM((3, cap, pyp), jnp.int32),
            pltpu.VMEM((1, cap, pyp), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_interpret(),
    )(r2, *operands, labels)
    return labels_out, changed, jnp.ones((pyp,), jnp.int32)


# ---------------------------------------------------------------------------
# full DBSCAN via Gauss-Seidel CCL
# ---------------------------------------------------------------------------

def _transpose_planes(a: jnp.ndarray, ncx: int, ncy: int) -> jnp.ndarray:
    """(PX, CAP, PYP) -> (PY', CAP, PXP): swap the sequential axis to y.
    Keeps only the ncy+2 meaningful rows; pads lanes to a 128 multiple."""
    px, cap, pyp = a.shape
    pxp = _round_up(px, 128)
    t = jnp.swapaxes(a, 0, 2)[:ncy + 2]          # (PY, CAP, PX)
    fill = INT_MAX if jnp.issubdtype(a.dtype, jnp.integer) else EMPTY_COORD
    return jnp.pad(t, ((0, 0), (0, 0), (0, pxp - px)),
                   constant_values=fill)


def _untranspose_labels(t: jnp.ndarray, px: int, pyp: int) -> jnp.ndarray:
    """(PY', CAP, PXP) labels back to (PX, CAP, PYP)."""
    py, cap, _ = t.shape
    back = jnp.swapaxes(t[:, :, :px], 0, 2)      # (PX, CAP, PY)
    return jnp.pad(back, ((0, 0), (0, 0), (0, pyp - py)),
                   constant_values=INT_MAX)


def dbscan_gs(points: jnp.ndarray, mask: jnp.ndarray, eps: float,
              min_samples: int, ncx: int, ncy: int, column_cap: int,
              max_iters: int = 40, npass: int = 4
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """DBSCAN-equivalent clustering via Gauss-Seidel CCL. Same contract as
    ops/clustering.dbscan_columns: (dense labels (N,), n_clusters,
    overflow)."""
    n = points.shape[0]
    stream = n < (1 << 24)
    if stream:
        planes = build_planes_stream(points, mask, min_cell=eps,
                                     ncx=ncx, ncy=ncy, cap=column_cap)
    else:
        planes = build_planes(points, mask, min_cell=eps, ncx=ncx,
                              ncy=ncy, cap=column_cap)
    px, cap, pyp = planes.xs.shape

    counts = column_counts_planes(planes, eps)            # (NCX, CAP, PYP)
    counts = jnp.pad(counts, ((1, 1), (0, 0), (0, 0)))
    valid = planes.ptidx >= 0
    core = valid & (counts >= min_samples)
    labels0 = jnp.where(core, planes.ptidx, INT_MAX)

    xs_t = _transpose_planes(planes.xs, ncx, ncy)
    ys_t = _transpose_planes(planes.ys, ncx, ncy)
    zs_t = _transpose_planes(planes.zs, ncx, ncy)

    pxp = _round_up(px, 128)
    rpb_x = _pick_rpb(ncx, cap, pyp)
    rpb_y = _pick_rpb(ncy, cap, pxp)

    def _seed_from(lanes_changed, last_pass_blocks, rpb):
        """Next-call pass-0 activity for one orientation: rows touched
        by the intervening transposed call (its LANE changes — lanes of
        one orientation are rows of the other) within each block's
        (rpb+2)-row window, plus the same orientation's own unfinished
        business (its final pass's changed blocks, +-1 block).  The
        per-row fallback (rpb == 1) ignores seeds and reports a single
        block: keep its seed a (1,) always-on stub."""
        nblk = last_pass_blocks.shape[0]
        if rpb == 1:
            return jnp.ones((nblk,), jnp.int32)
        cs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(lanes_changed.astype(jnp.int32))])
        b = jnp.arange(nblk)
        lo = b * rpb
        hi = jnp.minimum(lo + rpb + 2, lanes_changed.shape[0])
        win = cs[hi] - cs[lo]
        own = (last_pass_blocks + jnp.roll(last_pass_blocks, 1)
               + jnp.roll(last_pass_blocks, -1))
        return (win + own).astype(jnp.int32)

    def group(state):
        labels, _, it, seed_x, seed_y = state
        # npass=4 per orientation: with activity skipping the extra
        # fwd/bwd pair is nearly free once the long tail sets in, and
        # it halves the per-group label transposes (measured r5)
        labels, ch_x, lane_x = gs_passes(
            (planes.xs, planes.ys, planes.zs), labels, eps,
            npass=npass, seed_blocks=seed_x)
        lab_t = _transpose_planes(labels, ncx, ncy)
        lab_t, ch_y, lane_y = gs_passes((xs_t, ys_t, zs_t), lab_t, eps,
                                        npass=npass, seed_blocks=seed_y)
        labels = _untranspose_labels(lab_t, px, pyp)
        seed_x = _seed_from(lane_y, ch_x[-1], rpb_x)
        seed_y = _seed_from(lane_x, ch_y[-1], rpb_y)
        # a complete pass that changes nothing certifies the global
        # fixpoint (skipped blocks provably could not change) — only
        # the FINAL pass of the group matters, so a venue that
        # converges within one group exits immediately
        changed = jnp.sum(ch_y[-1])
        return labels, changed, it + 1, seed_x, seed_y

    nblk_x = ncx // rpb_x if rpb_x > 1 else 1
    nblk_y = ncy // rpb_y if rpb_y > 1 else 1
    labels, _, _, _, _ = jax.lax.while_loop(
        lambda s: (s[1] > 0) & (s[2] < max_iters), group,
        (labels0, jnp.asarray(1, jnp.int32), jnp.asarray(0, jnp.int32),
         jnp.ones((nblk_x,), jnp.int32), jnp.ones((nblk_y,), jnp.int32)))

    # border points adopt the min core-neighbor label
    border_min = border_min_planes(planes, labels, eps)
    border_min = jnp.pad(border_min, ((1, 1), (0, 0), (0, 0)),
                         constant_values=INT_MAX)
    labels = jnp.where(valid & ~core & (border_min != INT_MAX),
                       border_min, labels)

    # back to point order + dense-id compaction
    if stream:
        # extract matmul (stream order), then DENSIFY BY SORTING: dense
        # ids rank clusters by representative label (at the fixpoint the
        # distinct labels >= 0 are exactly the component minima), so
        # sorting (label, point-id) pairs by label and counting label
        # starts assigns the same ranks as the old
        # cumsum(is_rep)[label] remap — without its ~8.4M-element
        # arbitrary gather (~140 ms at 10M; two 2-lane sorts cost ~60).
        # Labels ride the extract as label+1 in f32 (exact for
        # n <= 2^24), so 0 doubles as "noise / not in table".
        from lidar_ai_recommendation_software_tpu.ops.pallas import fill

        lab_f = jnp.where(labels == INT_MAX, 0.0,
                          (labels + 1).astype(jnp.float32))
        got = fill.extract_stream(lab_f, planes.srow, planes.sy,
                                  planes.slots)
        labels_sorted = got.astype(jnp.int32) - 1
        key = jnp.where(labels_sorted < 0, INT_MAX, labels_sorted)
        key2, sidx2 = jax.lax.sort((key, planes.sidx), num_keys=1)
        is_new = jnp.concatenate(
            [key2[:1] != INT_MAX,
             (key2[1:] != key2[:-1]) & (key2[1:] != INT_MAX)])
        dense_sorted = jnp.where(
            key2 != INT_MAX,
            jnp.cumsum(is_new.astype(jnp.int32)) - 1, -1)
        _, dense = jax.lax.sort((sidx2, dense_sorted), num_keys=1)
        dense = jnp.where(mask, dense, -1)
        return (dense.astype(jnp.int32),
                jnp.sum(is_new.astype(jnp.int32)), planes.overflow)

    flat = jnp.concatenate([labels.reshape(-1),
                            jnp.array([INT_MAX], jnp.int32)])
    labels_pt = flat[jnp.clip(planes.point_pos, 0, labels.size)]
    labels_pt = jnp.where(labels_pt == INT_MAX, -1, labels_pt)
    labels_pt = jnp.where(mask, labels_pt, -1)

    idx = jnp.arange(n, dtype=jnp.int32)
    is_rep = (labels_pt == idx) & (labels_pt >= 0)
    dense_minus1 = jnp.cumsum(is_rep.astype(jnp.int32)) - 1
    safe = jnp.clip(labels_pt, 0, n - 1)
    dense = jnp.where(labels_pt >= 0, dense_minus1[safe], -1)
    return (dense.astype(jnp.int32), jnp.sum(is_rep.astype(jnp.int32)),
            planes.overflow)
