"""DBSCAN-equivalent clustering on the dense 2.5D column grid.

The reference clusters people with sklearn DBSCAN
(utils/data_processing.py:197, app_simplified.py:107). DBSCAN's
seed-expansion is inherently sequential; the TPU-native equivalent computes
the *same* clusters as parallel connected components over the column grid
(ops/columns.py):

  1. core points: |N_eps(p)| >= min_samples (self included — sklearn
     semantics), via the dense 3x3-column pairwise count;
  2. clusters = connected components of the core-core eps-adjacency,
     found by iterated min-label propagation: each sweep takes, for every
     table slot, the min label over eps-neighbors in the 9 adjacent
     columns — a static shift + pairwise mask + min-reduce, all dense VPU
     work — followed by pointer-jumping (path halving) through the
     point-index label space;
  3. border points adopt the min cluster label among their core neighbors;
     everything else is noise (-1).

The cluster *census* (number of clusters, member sets of core points) is
mathematically identical to DBSCAN's; only border points adjacent to two
clusters may differ (sklearn's choice there is scan-order dependent, i.e.
unspecified). Validated bit-exact against sklearn on the seed-42 fixture
(446 clusters / 2544 noise points).

Labels compact to dense ids 0..n_clusters-1 ordered by each cluster's
minimum point index. Min-label propagation over eps-balls is symmetric by
construction (the pairwise mask is), so no scatter is ever needed.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from lidar_ai_recommendation_software_tpu.ops import columns
from lidar_ai_recommendation_software_tpu.ops.columns import (
    build_column_grid)

INT_MAX = jnp.iinfo(jnp.int32).max


def _bf_row_chunks(points, mask, chunk):
    n, d = points.shape
    pad = (-n) % chunk
    pp = jnp.pad(points, ((0, pad), (0, 0)))
    mm = jnp.pad(mask, (0, pad))
    return pp.reshape((n + pad) // chunk, chunk, d), \
        mm.reshape((n + pad) // chunk, chunk), n


def dbscan_bruteforce(points: jnp.ndarray, mask: jnp.ndarray, eps: float,
                      min_samples: int, max_iters: int = 40,
                      chunk: int = 2048
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact DBSCAN-equivalent via tiled all-pairs distances.

    For padded sets up to ~32K points the full (N, N) masked distance
    reduction — row-chunked so nothing N^2 materialises in HBM — is faster
    on TPU than any spatial structure: it is pure fused multiply/compare/
    reduce at VPU speed with zero gathers. Works in any dimension and any
    coordinate scaling (the modular variant clusters StandardScaler-warped
    space where spatial bucketing degenerates; this path handles it).
    """
    n = points.shape[0]
    assert n % 32 == 0, "brute-force DBSCAN needs capacity % 32 == 0"
    w = n // 32
    r2 = jnp.asarray(eps, points.dtype) ** 2
    qs, qm, _ = _bf_row_chunks(points, mask, chunk)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))

    # One geometric pass: packed eps-adjacency rows (n, n/32) uint32.
    # Counts are popcounts; every sweep afterwards is coordinate-free
    # bit-select + integer-min.
    def adj_chunk(args):
        q, qmk = args
        d2 = jnp.sum((q[:, None, :] - points[None, :, :]) ** 2, axis=-1)
        hit = (d2 <= r2) & mask[None, :] & qmk[:, None]
        return jnp.sum(
            jnp.where(hit.reshape(q.shape[0], w, 32), weights, 0),
            axis=-1, dtype=jnp.uint32)

    adj = jax.lax.map(adj_chunk, (qs, qm)).reshape(-1, w)[:n]
    counts = jnp.sum(jax.lax.population_count(adj).astype(jnp.int32),
                     axis=1)
    core = mask & (counts >= min_samples)
    core_words = jnp.sum(
        jnp.where(core.reshape(w, 32), weights, 0), axis=-1,
        dtype=jnp.uint32)
    adj_core = adj & core_words[None, :]

    idx = jnp.arange(n, dtype=jnp.int32)
    labels0 = jnp.where(core, idx, INT_MAX)

    def min_sweep(labels, q_select):
        # NB: the bit loop is STATICALLY UNROLLED — a (c, w, 32) broadcast
        # shift inside a while_loop body sends the XLA:TPU loop optimizer
        # into minutes-long compiles; 32 scalar-shift steps compile in
        # seconds and run at the same speed.
        lab_tiles = labels.reshape(w, 32)

        def chunk_fn(a):
            acc = jnp.full((a.shape[0],), INT_MAX, jnp.int32)
            for k in range(32):
                m = (a >> jnp.uint32(k)) & jnp.uint32(1)
                cand = jnp.where(m == 1, lab_tiles[None, :, k], INT_MAX)
                acc = jnp.minimum(acc, jnp.min(cand, axis=1))
            return acc

        pad = (-n) % chunk
        ap = jnp.pad(adj_core, ((0, pad), (0, 0)))
        out = jax.lax.map(
            chunk_fn, ap.reshape((n + pad) // chunk, chunk, w)
        ).reshape(-1)[:n]
        return jnp.where(q_select, out, INT_MAX)

    def sweep(state):
        labels, _, it = state
        nbr_min = min_sweep(labels, core)
        new = jnp.where(core, jnp.minimum(labels, nbr_min), labels)
        for _ in range(2):  # pointer jumping
            safe = jnp.clip(new, 0, n - 1)
            new = jnp.where(core, jnp.minimum(new, new[safe]), new)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(
        lambda s: s[1] & (s[2] < max_iters), sweep,
        (labels0, jnp.asarray(True), jnp.asarray(0)))

    border_min = min_sweep(labels, mask & ~core)
    labels = jnp.where(mask & ~core & (border_min != INT_MAX),
                       border_min, labels)
    labels = jnp.where(labels == INT_MAX, -1, labels)

    is_rep = (labels == idx) & core
    dense_minus1 = jnp.cumsum(is_rep.astype(jnp.int32)) - 1
    safe = jnp.clip(labels, 0, n - 1)
    dense = jnp.where(labels >= 0, dense_minus1[safe], -1)
    return (dense.astype(jnp.int32), jnp.sum(is_rep.astype(jnp.int32)),
            jnp.asarray(0, jnp.int32))


# Below this padded capacity the tiled all-pairs path wins; above it the
# column grid's O(n * cap^2) dominates O(n^2).
BRUTEFORCE_MAX_POINTS = 32768

# Hard capacity of the brute-force backend when it is the ONLY exact
# option (macroscopic eps, see dbscan_labels): the packed adjacency is
# cap^2/8 bytes — 2.1 GB HBM at 131072. This also tracks the reference's
# own feasibility wall: sklearn DBSCAN at eps=0.5 in standardized space
# materialises ~cap^2 * pi eps^2 / venue-area neighbor int64s (~10 GB at
# 131k, MemoryError well before 1M), so capability parity holds.
BRUTEFORCE_HARD_CAP = 131072


def dbscan_labels(points: jnp.ndarray, mask: jnp.ndarray, eps: float,
                  min_samples: int, ncx: int = 128, ncy: int = 128,
                  column_cap: int = 64, max_iters: int = 40,
                  brute_cap: int = BRUTEFORCE_MAX_POINTS
                  ) -> Tuple[jnp.ndarray, jnp.ndarray,
                             jnp.ndarray]:
    """Cluster padded ``points`` (N, D). Returns (labels (N,) int32 with
    -1 noise / dense cluster ids, n_clusters (), overflow () int32 —
    points dropped because a column exceeded ``column_cap``; 0 means the
    result is exact). Dispatches on static capacity: tiled all-pairs for
    small sets; at venue scale the Pallas Gauss-Seidel CCL on TPU
    (ops/ccl.py — 166 ms vs 6.28 s for the jnp column path at 1M, r5) or the jnp
    column grid elsewhere (``LIDAR_JNP_CCL=1`` forces the jnp path).

    ``brute_cap`` raises the all-pairs dispatch ceiling. The modular
    variant clusters StandardScaler-warped space where eps = 0.5 sigma is
    MACROSCOPIC — the venue spans ~7 eps per axis, so every eps-sized
    column holds O(n/49) points and the dense column tables degenerate
    (a measured cap means a (cap, NCX, NCY) table in the hundreds of GB).
    The packed-bitmask brute force is exact in any scaling and is the
    only exact backend there; callers in that regime pass
    ``brute_cap=BRUTEFORCE_HARD_CAP``."""
    if points.shape[0] <= max(brute_cap, BRUTEFORCE_MAX_POINTS):
        return dbscan_bruteforce(points, mask, eps, min_samples,
                                 max_iters=max_iters)
    import os

    import jax as _jax

    from lidar_ai_recommendation_software_tpu.ops import ccl
    if (_jax.default_backend() == "tpu"
            and not os.environ.get("LIDAR_JNP_CCL")):
        return ccl.dbscan_gs(points, mask, eps, min_samples, ncx=ncx,
                             ncy=ncy, column_cap=column_cap,
                             max_iters=max_iters)
    return dbscan_columns(points, mask, eps, min_samples, ncx=ncx,
                          ncy=ncy, column_cap=column_cap,
                          max_iters=max_iters)


def table_to_point_order(grid, interior_tbl: jnp.ndarray,
                         fill) -> jnp.ndarray:
    """Gather an interior (NCX, NCY, CAP) table back into point order
    (N,), ``fill`` for points outside the grid (invalid / overflow)."""
    flat = jnp.concatenate(
        [columns.pad_interior(interior_tbl, fill).reshape(-1),
         jnp.asarray([fill], interior_tbl.dtype)])
    return flat[jnp.clip(grid.point_pos, 0, grid.table_ptidx.size)]


def ccl_core_labels(grid, core_int: jnp.ndarray, eps: float,
                    max_iters: int = 40, stripe: int = 8,
                    shortcut_rounds: int = 0
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Connected components over the core-core eps-adjacency of a column
    grid: iterated min-label propagation + pointer jumping (the per-sweep
    kernel of dbscan_columns, factored so the spatially-sharded DBSCAN in
    parallel/cluster.py can run it as its per-shard kernel with an
    externally-supplied core mask).

    Labels hold ORIGINAL point indices (the index space of the array
    passed to ``build_column_grid``); at the fixpoint each core point
    carries the min point index of its component. Returns
    (labels_pt (N,), labels_int (NCX, NCY, CAP)) — point order and table
    layout; INT_MAX for non-core slots.
    """
    n = grid.point_pos.shape[0]
    core_pad = columns.pad_interior(core_int, False)
    ptidx_int = grid.table_ptidx[1:-1, 1:-1]
    labels0 = jnp.where(core_int, ptidx_int, INT_MAX)

    def jump(labels_int, labels_by_point):
        """labels hold point indices; chase one hop via point order."""
        safe = jnp.clip(labels_int, 0, n - 1)
        hop = labels_by_point[safe]
        ok = (labels_int != INT_MAX) & (hop != INT_MAX)
        return jnp.where(ok, jnp.minimum(labels_int, hop), labels_int)

    def sweep(state):
        labels, _, it = state
        nbr_min = columns.column_min_label(
            grid, columns.pad_interior(labels, INT_MAX), core_pad, eps,
            INT_MAX, stripe=stripe)
        new = jnp.where(core_int, jnp.minimum(labels, nbr_min), labels)
        # path-halving rounds: each one re-reads the point-order view and
        # chases one hop — a pair of n-gathers, ~1000x cheaper than a
        # neighborhood sweep, and together they collapse label chains so
        # long components converge in ~log(diameter) sweeps.
        for _ in range(1 + shortcut_rounds):
            new = jump(new, table_to_point_order(grid, new, INT_MAX))
        return new, jnp.any(new != labels), it + 1

    # initial flag derived from a varying value so the carry's manual
    # axes match inside shard_map (see shard_map docs on scan-vma)
    labels_int, _, _ = jax.lax.while_loop(
        lambda s: s[1] & (s[2] < jnp.asarray(max_iters, s[2].dtype)),
        sweep, (labels0, jnp.any(labels0 >= INT_MAX) | True,
                jnp.asarray(0)))
    return table_to_point_order(grid, labels_int, INT_MAX), labels_int


def dbscan_columns(points: jnp.ndarray, mask: jnp.ndarray, eps: float,
                   min_samples: int, ncx: int = 128, ncy: int = 128,
                   column_cap: int = 64, max_iters: int = 40,
                   stripe: int = 0, shortcut_rounds: int = 0
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Column-grid DBSCAN (see module docstring). Interior label tables are
    (NCX, NCY, CAP); padded views are created per sweep (cheap: one pad of
    the int32 label table) so every neighborhood pass runs striped.

    Perf note (measured at 1M points / 768x768 columns on v5e): each sweep
    recomputes pairwise distances in fused f32 VPU work (column_min_label,
    ~8 flops/pair) rather than bit-selecting from a precomputed packed
    adjacency — the 32-step scalar bit-unpack costs ~10x more VPU time per
    sweep than the distance math it avoids. ``shortcut_rounds`` extra
    pointer-jumping (path-halving) hops per sweep cut the sweep count on
    sprawling terrain components (graph diameter ~ venue_extent / eps) —
    but each round costs two ~n-element gathers (~113 ms at n=1M on v5e;
    TPU gathers run at ~18M elem/s), so extra rounds beyond the one built
    into every sweep only pay off when a sweep costs far more than two
    gathers. Pair-test work scales as ncells * 9 * cap^2: prefer fine
    cells with a small cap (fit_capacity sizes cap to occupancy).
    """
    n = points.shape[0]
    if stripe <= 0:
        # target ~8-12 sequential stripe steps: big enough to saturate the
        # VPU, small enough that fused per-stripe temps stay in-budget
        stripe = max(8, min(64, ncx // 8))
    grid = build_column_grid(points, mask, min_cell=eps, ncx=ncx, ncy=ncy,
                             cap=column_cap)

    counts = columns.column_counts(grid, eps, stripe=stripe)
    valid_int = grid.table_valid[1:-1, 1:-1]
    core_int = valid_int & (counts >= min_samples)
    core_pad = columns.pad_interior(core_int, False)

    _, labels_int = ccl_core_labels(grid, core_int, eps,
                                    max_iters=max_iters, stripe=stripe,
                                    shortcut_rounds=shortcut_rounds)

    # Border points: min label among core eps-neighbors.
    border_min = columns.column_min_label(
        grid, columns.pad_interior(labels_int, INT_MAX), core_pad, eps,
        INT_MAX, stripe=stripe)
    border_sel = valid_int & ~core_int
    labels_int = jnp.where(border_sel & (border_min != INT_MAX),
                           border_min, labels_int)

    # Back to point order: one gather via each point's table position.
    labels_pt = table_to_point_order(grid, labels_int, INT_MAX)
    labels_pt = jnp.where(labels_pt == INT_MAX, -1, labels_pt)
    labels_pt = jnp.where(mask, labels_pt, -1)

    # Compact representative point-indices -> dense ids.
    idx = jnp.arange(n, dtype=jnp.int32)
    is_rep = (labels_pt == idx) & (labels_pt >= 0)
    dense_minus1 = jnp.cumsum(is_rep.astype(jnp.int32)) - 1
    safe = jnp.clip(labels_pt, 0, n - 1)
    dense = jnp.where(labels_pt >= 0, dense_minus1[safe], -1)
    return (dense.astype(jnp.int32), jnp.sum(is_rep.astype(jnp.int32)),
            grid.overflow)


# Above this padded point count the sort-based centroid path replaces the
# XLA scatter (segment_sum): measured at 16.7M points / 2M segments on
# v5e, segment_sum costs 1219 ms (TPU scatter ~20M rows/s) while the
# sort+scan formulation costs ~280 ms.
SEGSUM_MAX_POINTS = 2_097_152


def _df_add(a, b):
    """Double-float (compensated) addition: (sum, err) pairs with ~2^-48
    effective mantissa. Associative enough for scan use — error growth is
    O(log n) with a fixed reduction tree, vs O(n)*2^-24 for plain f32
    cumsum, which loses ~0.04 m on 16.7M-point prefixes (measured)."""
    s1, e1 = a
    s2, e2 = b
    s = s1 + s2
    v = s - s1
    err = (s1 - (s - v)) + (s2 - v)
    return s, err + e1 + e2


def _blocked_prefix(op, xs, block: int = 65536):
    """Inclusive prefix of associative ``op`` over axis 0, hierarchically:
    a ``lax.scan`` over blocks carrying the running total, with a small
    ``associative_scan`` inside each block.

    A flat associative_scan at venue scale unrolls ~2*log2(n) levels of
    full-size tensor ops into the module — measured: it doubled the
    lowered HLO at 8M rows and OOM-killed (SIGKILL) the remote TPU AOT
    compile helper. Here the module holds one loop body with
    O(log block) ops on (block, ...) tensors; runtime adds only the
    n/block-step loop (~milliseconds).

    ``xs`` is a pytree of arrays sharing axis-0 length; ``op`` maps two
    such pytrees (without the leading axis) to one; the identity must be
    zeros of each leaf."""
    leaves = jax.tree_util.tree_leaves(xs)
    n = leaves[0].shape[0]
    npad = -(-n // block) * block
    xsb = jax.tree_util.tree_map(
        lambda a: jnp.pad(a, [(0, npad - n)] + [(0, 0)] * (a.ndim - 1))
        .reshape((npad // block, block) + a.shape[1:]), xs)

    def step(carry, blk):
        pref = jax.lax.associative_scan(op, blk, axis=0)
        with_carry = op(jax.tree_util.tree_map(
            lambda c, p: jnp.broadcast_to(c, p.shape), carry, pref),
            pref)
        new_carry = jax.tree_util.tree_map(lambda p: p[-1], with_carry)
        return new_carry, with_carry

    carry0 = jax.tree_util.tree_map(
        lambda a: jnp.zeros(a.shape[2:], a.dtype), xsb)
    _, out = jax.lax.scan(step, carry0, xsb)
    return jax.tree_util.tree_map(
        lambda a: a.reshape((npad,) + a.shape[2:])[:n], out)


def _lane_prefix_df(vals: jnp.ndarray, lanes: int = 128
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inclusive compensated (double-float) prefix over axis 0 of an
    (n, d) array, lane-parallel.

    ``_blocked_prefix`` on (n, 3) data runs every op at 3/128 lane
    utilization — measured 129-135 ms for the 10.49M-row centroid
    prefix at EVERY block size (the scan's log-passes, not dispatch,
    bound it).  Here each of d*lanes lane-columns owns a CONTIGUOUS
    row chunk: one transpose in, a full-width associative scan
    (~17 levels of (chunk, d*lanes) adds at full lane utilization), a
    tiny per-lane carry scan, one transpose out.  Returns (hi, lo)
    double-float pairs; same O(log n) compensated error model as
    _blocked_prefix (the reduction tree differs, so last-ulp bits may
    differ — both are equally valid compensated sums)."""
    n, d = vals.shape
    lanes = int(lanes)
    chunk = -(-n // lanes)
    npad = chunk * lanes
    v = jnp.pad(vals, ((0, npad - n), (0, 0)))
    v = jnp.transpose(v.reshape(lanes, chunk, d),
                      (1, 2, 0)).reshape(chunk, d * lanes)
    hi, lo = jax.lax.associative_scan(
        _df_add, (v, jnp.zeros_like(v)), axis=0)
    # per-lane totals -> exclusive carries within each channel's lanes
    th = hi[-1].reshape(d, lanes)
    tl = lo[-1].reshape(d, lanes)
    ch_, cl_ = jax.lax.associative_scan(_df_add, (th, tl), axis=1)
    z = jnp.zeros((d, 1), vals.dtype)
    ch_ = jnp.concatenate([z, ch_[:, :-1]], axis=1).reshape(d * lanes)
    cl_ = jnp.concatenate([z, cl_[:, :-1]], axis=1).reshape(d * lanes)
    oh, ol = _df_add((ch_[None, :], cl_[None, :]), (hi, lo))

    def back(a):
        return jnp.transpose(a.reshape(chunk, d, lanes),
                             (2, 0, 1)).reshape(npad, d)[:n]

    return back(oh), back(ol)


def _centroids_sorted(points: jnp.ndarray, seg: jnp.ndarray, k: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Segment means via sort + compensated prefix scan (no scatter).

    Exploits that the pipeline's labels are DENSE ids 0..C-1: after
    sorting by segment, segment j's rows are contiguous and its END row
    holds the inclusive prefix of everything up to and including the
    segment, so per-segment sums are differences of ADJACENT dense
    slots once the end-row prefixes are packed densely by one more sort
    — no scatter and no carry-last-flagged scan (an earlier revision
    scanned 8 carry channels; that alone doubled the lowered HLO at
    venue scale and OOM-killed the remote TPU compile helper, and its
    packing left phantom nonzero counts in slots past C — caught by
    test_clustering.py::test_centroids_sorted_no_phantom_slots).

    Returns (sums (K, D), counts (K,)); slots >= C are exactly zero."""
    n, d = points.shape
    cols = [points[:, i] for i in range(d)]
    sorted_all = jax.lax.sort((seg,) + tuple(cols), num_keys=1)
    seg_s = sorted_all[0]
    pts_s = jnp.stack(sorted_all[1:], axis=1)           # (n, d)

    # ONE lane-parallel double-float prefix over all d coordinate
    # channels (_lane_prefix_df).  The row-count prefix needs no scan
    # at all: an inclusive prefix of ones IS iota+1.
    s_hi, s_lo = _lane_prefix_df(pts_s)
    cnt_prefix = jnp.arange(1, n + 1, dtype=jnp.int32)

    is_end = jnp.concatenate([seg_s[1:] != seg_s[:-1],
                              jnp.ones((1,), bool)])
    # pack each end row's inclusive prefix into dense slot seg_s.
    # Dense ids make the destinations MONOTONE with at most one end row
    # per slot, so the pack is a dispatch-matmul placement
    # (ops/pallas/fill.place_dense, exact via 3-way bf16 splits) rather
    # than an (2d+2)-lane full-length sort (measured 34 ms at 10.49M
    # rows on v5e).  Beyond f32-exact integer range the sort path
    # remains (prefix counts ride f32).
    valid_end = is_end & (seg_s < k)
    if n < (1 << 24):
        from lidar_ai_recommendation_software_tpu.ops.pallas import fill

        chans = ([s_hi[:, i] for i in range(d)]
                 + [s_lo[:, i] for i in range(d)]
                 + [cnt_prefix.astype(jnp.float32)])
        placed, occ = fill.place_dense(seg_s, valid_end, chans, k)
        real = occ[:k] > 0.5
        p_hi = jnp.stack([placed[i][:k] for i in range(d)], axis=1)
        p_lo = jnp.stack([placed[d + i][:k] for i in range(d)], axis=1)
        p_cnt = placed[2 * d][:k].astype(jnp.int32)
    else:
        key = jnp.where(valid_end, seg_s, jnp.int32(k))
        packed = jax.lax.sort(
            (key,)
            + tuple(s_hi[:, i] for i in range(d))
            + tuple(s_lo[:, i] for i in range(d))
            + (cnt_prefix,), num_keys=1)
        # slot j holds segment j's end iff the packed key equals j
        # (dense ids: true exactly for j < C)
        real = packed[0][:k] == jnp.arange(k, dtype=jnp.int32)
        p_hi = jnp.stack(packed[1:1 + d], axis=1)[:k]
        p_lo = jnp.stack(packed[1 + d:1 + 2 * d], axis=1)[:k]
        p_cnt = packed[-1][:k]

    def prev(a):
        pad = jnp.zeros_like(a[:1])
        return jnp.concatenate([pad, a[:-1]], axis=0)

    seg_sums = jnp.where(
        real[:, None],
        (p_hi - prev(p_hi)) + (p_lo - prev(p_lo)), 0.0)
    seg_cnt = jnp.where(real, p_cnt - prev(p_cnt), 0)
    return seg_sums, seg_cnt.astype(points.dtype)


def cluster_centroids(points: jnp.ndarray, labels: jnp.ndarray,
                      max_clusters: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-cluster centroids (segment mean). Returns
    (centroids (K, D), valid (K,), overflow () int32 — the number of
    clusters whose dense id >= ``max_clusters`` and were therefore dropped
    from the segment sums; 0 means the census is exact). Mirrors
    extract_people_positions (utils/data_processing.py:251-280, which
    never drops a cluster); callers slice the dims they need and must
    surface/retry on nonzero overflow (Pipeline.analyze does).

    Two backends on static size: XLA segment_sum (scatter) up to
    SEGSUM_MAX_POINTS, and the sort+compensated-scan path at venue scale
    where TPU scatter throughput (~20M rows/s) dominates the stage
    (VERDICT r2: extract_people was 27% of the 10M pipeline)."""
    k = max_clusters
    n = points.shape[0]
    seg = jnp.where(labels >= 0, labels, k)  # overflow/noise bucket at k
    if n > SEGSUM_MAX_POINTS:
        sums, cnts = _centroids_sorted(points, seg.astype(jnp.int32), k)
    else:
        sums = jax.ops.segment_sum(points, seg, num_segments=k + 1)[:k]
        cnts = jax.ops.segment_sum(
            jnp.ones(points.shape[0], points.dtype), seg,
            num_segments=k + 1)[:k]
    valid = cnts > 0
    # labels are dense 0..n_clusters-1, so clusters dropped by the
    # capacity clamp = max_label + 1 - k when the max spills past k.
    overflow = jnp.maximum(jnp.max(labels, initial=-1) + 1 - k, 0
                           ).astype(jnp.int32)
    return sums / jnp.maximum(cnts, 1.0)[:, None], valid, overflow
