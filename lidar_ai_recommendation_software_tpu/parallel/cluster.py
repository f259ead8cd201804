"""Spatially-sharded DBSCAN: venue-scale clustering across a device mesh.

The single-device clustering (ops/clustering.py, ops/ccl.py) is the
per-shard kernel; this module scales it across an ``sp`` mesh axis by
x-striping the venue — the point-cloud analogue of context/sequence
parallelism (SURVEY.md §5): each device owns one x-stripe of the venue
plus an eps-wide HALO of copied boundary points from its neighbors, so
every eps-ball (core test) that straddles a shard edge is evaluated
exactly. Cluster labels are global point indices; components spanning
stripes converge by alternating

    local min-label propagation to fixpoint   (on-device, no comms)
    boundary label exchange via ppermute      (halo copies adopt the
                                               owner's latest label and
                                               vice versa — min is safe
                                               in both directions)

until a global ``psum`` of label changes reaches zero — a component
spanning k stripes needs at most k exchange rounds. The final labels for
OWNED points equal the single-device result exactly (same min-label
fixpoint over the same eps-graph).

Communication rides the mesh axis with ``ppermute`` (ICI-neighbor
pattern, no all-to-all), matching the halo-exchange design of
sharded_flow_and_bottlenecks (parallel/spatial.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

INT_MAX = jnp.iinfo(jnp.int32).max


def partition_stripes(points: np.ndarray, n_shards: int, halo: float,
                      cap: int = 0) -> Tuple[np.ndarray, np.ndarray,
                                             np.ndarray, np.ndarray]:
    """Host-side prep: split points into ``n_shards`` x-stripes of equal
    width, each padded buffer carrying its OWN points plus halo copies
    within ``halo`` of its stripe edges.

    Returns (buffers (S, CAP, 3), valid (S, CAP), owned (S, CAP),
    global_ids (S, CAP) int32). ``owned`` marks points whose stripe this
    is (each point owned exactly once); halo copies have owned=False.
    """
    n = len(points)
    x = points[:, 0]
    lo, hi = float(x.min()), float(x.max()) + 1e-6
    width = (hi - lo) / n_shards
    if width < halo:
        raise ValueError(
            f"stripe width {width:.3f} < halo {halo:.3f}: neighbor-only "
            "exchange would miss eps-balls spanning two boundaries — use "
            "fewer shards for this venue extent")
    stripe_of = np.clip(((x - lo) / width).astype(np.int64), 0,
                        n_shards - 1)

    members = []
    for s in range(n_shards):
        s_lo = lo + s * width
        s_hi = s_lo + width
        own = stripe_of == s
        in_halo = (~own) & (x >= s_lo - halo) & (x < s_hi + halo)
        ids = np.concatenate([np.nonzero(own)[0], np.nonzero(in_halo)[0]])
        members.append((ids, own[ids]))

    need = max(len(ids) for ids, _ in members)
    if cap <= 0:
        cap = max(128, 1 << int(np.ceil(np.log2(max(1, need)))))
    if need > cap:
        raise ValueError(f"stripe needs {need} slots > cap {cap}")

    bufs = np.zeros((n_shards, cap, 3), np.float32)
    valid = np.zeros((n_shards, cap), bool)
    owned = np.zeros((n_shards, cap), bool)
    gids = np.full((n_shards, cap), -1, np.int32)
    for s, (ids, own_flags) in enumerate(members):
        k = len(ids)
        bufs[s, :k] = points[ids]
        valid[s, :k] = True
        owned[s, :k] = own_flags
        gids[s, :k] = ids
    return bufs, valid, owned, gids


def _local_adjacency(pts, valid, eps):
    """(CAP, CAP) eps-adjacency (self included) among valid points."""
    d2 = jnp.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    return (d2 <= eps * eps) & valid[None, :] & valid[:, None]


def _propagate_local(labels, adj_core, core, max_iters: int):
    """Min-label propagation to the local fixpoint (fori on small caps)."""

    def sweep(state):
        lab, _, it = state
        cand = jnp.where(adj_core, lab[None, :], INT_MAX)
        nbr = jnp.min(cand, axis=1)
        new = jnp.where(core, jnp.minimum(lab, nbr), lab)
        return new, jnp.any(new != lab), it + jnp.asarray(1, jnp.int32)

    # initial flag derived from a varying value so the carry's manual
    # axes match inside shard_map (see shard_map docs on scan-vma)
    out, _, _ = jax.lax.while_loop(
        lambda s: s[1] & (s[2] < max_iters), sweep,
        (labels, jnp.any(labels >= INT_MAX) | True,
         jnp.asarray(0, jnp.int32)))
    return out


def sharded_dbscan_labels(bufs: jnp.ndarray, valid: jnp.ndarray,
                          owned: jnp.ndarray, gids: jnp.ndarray,
                          eps: float, min_samples: int, mesh: Mesh,
                          axis: str = "sp", max_rounds: int = 32,
                          max_local_iters: int = 256) -> jnp.ndarray:
    """Global DBSCAN labels over stripe-partitioned points.

    Inputs are the arrays from ``partition_stripes`` (leading dim =
    shards, sharded over ``axis``). Returns (S, CAP) int32: for OWNED
    slots, the representative's global point index (min over the
    component) or -1 for noise — identical to single-device DBSCAN over
    the full cloud. Halo slots are a by-product and may be stale.
    """
    nsh = mesh.shape[axis]

    def shard_fn(pts, val, own, gid):
        pts, val, own, gid = pts[0], val[0], own[0], gid[0]
        adj = _local_adjacency(pts, val, eps)
        # Exact core test: every eps-ball of an OWNED point is complete
        # (halo >= eps). Halo copies get their owner's verdict implicitly:
        # their local count may be truncated, so compute core only for
        # owned, and receive the neighbor's core flag for halo slots via
        # the label exchange (a non-core point never carries a label).
        counts = jnp.sum(adj, axis=1)
        core_own = own & (counts >= min_samples)

        # Halo slots: core status belongs to the owner. A halo copy of a
        # core point must participate in propagation (it is how labels
        # cross the boundary); a halo copy of a non-core (border/noise)
        # point must NOT relay labels. Its own count over the full ball
        # IS available here when the copy lies within halo of our edge
        # and its ball is inside our extended slab — guaranteed since
        # halo >= eps: every point within eps of a halo copy of p is
        # within 2*eps of our stripe, and our buffer holds points within
        # halo(>=eps) — NOT sufficient for 2*eps. So: exchange core
        # flags computed by owners instead of recomputing.
        core = core_own

        # labels: global ids for core points, INT_MAX otherwise
        labels = jnp.where(core, gid, INT_MAX)

        def xchg(arr):
            """min-join labels across neighbor shards by global id.

            Sends ALL valid slots both ways — owner -> halo copy (labels
            cross the boundary outward) AND halo copy -> owner (labels a
            copy picked up locally flow back). Min is safe in both
            directions; gids are unique per physical point."""
            payload_gid = jnp.where(val, gid, -1)
            payload_val = jnp.where(val, arr, INT_MAX)
            left_g = jax.lax.ppermute(
                payload_gid, axis,
                [(i, (i + 1) % nsh) for i in range(nsh)])
            right_g = jax.lax.ppermute(
                payload_gid, axis,
                [(i, (i - 1) % nsh) for i in range(nsh)])
            left_v = jax.lax.ppermute(
                payload_val, axis,
                [(i, (i + 1) % nsh) for i in range(nsh)])
            right_v = jax.lax.ppermute(
                payload_val, axis,
                [(i, (i - 1) % nsh) for i in range(nsh)])

            def join(nbr_g, nbr_v, cur):
                # for each of our slots, min value among neighbor slots
                # with the same gid
                same = (gid[:, None] == nbr_g[None, :]) & (nbr_g[None, :]
                                                           >= 0)
                v = jnp.where(same, nbr_v[None, :], INT_MAX)
                return jnp.minimum(cur, jnp.min(v, axis=1))

            out = join(left_g, left_v, arr)
            out = join(right_g, right_v, out)
            return out

        # one-time: halo copies learn their owner's core flag (encoded as
        # label != INT_MAX after the owner's initial labeling)
        labels = xchg(labels)
        halo_core = val & ~own & (labels != INT_MAX)
        core = core | halo_core
        adj_core = adj & core[None, :]

        def round_fn(state):
            lab, _, rnd = state
            lab = _propagate_local(lab, adj_core, core, max_local_iters)
            lab2 = xchg(lab)
            changed = jax.lax.psum(
                jnp.sum((lab2 != lab).astype(jnp.int32)), axis)
            return lab2, changed > 0, rnd + jnp.asarray(1, jnp.int32)

        # outer flag is psum-reduced (axis-invariant), so the initial
        # value stays a plain scalar
        labels, _, _ = jax.lax.while_loop(
            lambda s: s[1] & (s[2] < max_rounds), round_fn,
            (labels, jnp.asarray(True), jnp.asarray(0, jnp.int32)))
        labels = _propagate_local(labels, adj_core, core,
                                  max_local_iters)

        # border points (owned, valid, non-core): min core-neighbor label
        border_min = jnp.min(
            jnp.where(adj_core, labels[None, :], INT_MAX), axis=1)
        labels = jnp.where(own & val & ~core & (border_min != INT_MAX),
                           border_min, labels)
        labels = jnp.where(labels == INT_MAX, -1, labels)
        labels = jnp.where(val & own, labels, -1)
        return labels[None]

    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(P(axis), P(axis), P(axis), P(axis)),
                       out_specs=P(axis))
    return fn(bufs, valid, owned, gids)


def sharded_dbscan(points: np.ndarray, eps: float, min_samples: int,
                   mesh: Mesh, axis: str = "sp") -> np.ndarray:
    """Convenience wrapper: full cloud in, per-point global labels out
    (representative global ids, -1 noise), bit-equal to single-device
    DBSCAN. Halo width = eps exactly."""
    nsh = mesh.shape[axis]
    bufs, valid, owned, gids = partition_stripes(points, nsh, halo=eps)
    lab = np.asarray(sharded_dbscan_labels(
        jnp.asarray(bufs), jnp.asarray(valid), jnp.asarray(owned),
        jnp.asarray(gids), eps, min_samples, mesh, axis=axis))
    out = np.full(len(points), -1, np.int32)
    g = np.asarray(gids)
    o = np.asarray(owned)
    out[g[o]] = lab[o]
    return out
