"""Ball-query grouping for set-abstraction layers.

``ball_group``: for M query centroids over N source points, return up to K
neighbor indices within radius r — the PointNet++ grouping primitive. On
TPU this is a tiled dense (M_chunk, N) masked distance pass (MXU/VPU
friendly, zero gathers until the final feature pick-up), not a tree query;
first-K-in-scan-order selection matches the classic CUDA ball-query
semantics.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def ball_group(queries: jnp.ndarray, qmask: jnp.ndarray,
               points: jnp.ndarray, pmask: jnp.ndarray, radius: float,
               k: int, chunk: int = 512) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (idx (M, K) int32, valid (M, K) bool).

    Slots beyond the neighbor count repeat the first neighbor (standard
    PointNet++ padding so pooled features are unaffected); fully empty
    neighborhoods return valid=False everywhere."""
    m = queries.shape[0]
    n = points.shape[0]
    r2 = jnp.asarray(radius, points.dtype) ** 2

    int_min = jnp.iinfo(jnp.int32).min

    def chunk_fn(args):
        q, qm = args
        d2 = jnp.sum((q[:, None, :] - points[None, :, :]) ** 2, axis=-1)
        hit = (d2 <= r2) & pmask[None, :] & qm[:, None]
        # first-K-in-scan-order via top_k on a negated-index score — a
        # (chunk, N) 2D scatter here costs ~100 ns/element on TPU (it
        # was 5 s for 4096x100k queries); top_k is ~1000x cheaper and
        # selects exactly the K smallest hit columns
        cols = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[None, :], hit.shape)
        score = jnp.where(hit, -cols, int_min)
        vals, idx = jax.lax.top_k(score, k)
        val = vals != int_min
        idx = jnp.where(val, -vals, 0).astype(jnp.int32)
        # pad empty slots with the first neighbor
        first = idx[:, :1]
        idx = jnp.where(val, idx, first)
        return idx, val

    pad = (-m) % chunk
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    qm = jnp.pad(qmask, (0, pad))
    steps = (m + pad) // chunk
    if steps == 1:
        idx, val = chunk_fn((qp, qm))
    else:
        idx, val = jax.lax.map(
            chunk_fn, (qp.reshape(steps, chunk, -1),
                       qm.reshape(steps, chunk)))
        idx = idx.reshape(steps * chunk, k)
        val = val.reshape(steps * chunk, k)
    return idx[:m], val[:m]


def group_features(points: jnp.ndarray, features, centroids: jnp.ndarray,
                   idx: jnp.ndarray, valid: jnp.ndarray):
    """Gather grouped relative coordinates (+features) for an SA layer.

    Returns (M, K, 3 [+C]) with invalid slots zeroed."""
    rel = points[idx] - centroids[:, None, :]          # (M, K, 3)
    rel = jnp.where(valid[..., None], rel, 0.0)
    if features is None:
        return rel
    feats = jnp.where(valid[..., None], features[idx], 0.0)
    return jnp.concatenate([rel, feats], axis=-1)
