"""Packed-adjacency bit-set formulation of the eps-neighbor sweeps.

BENCHMARK-ONLY (VERDICT r3 item 7): precomputing a per-slot uint32
adjacency bit-set turns every label-propagation sweep into bit-select +
integer-min with no coordinate math — but the measured end-to-end result
LOSES to recomputing distances in-sweep on TPU (ops/clustering.py:271
documents the numbers: the adjacency table's HBM traffic exceeds the
recomputed FLOPs, which ride the VPU for free). Kept here for the
profile sweep (benchmarks/profile_sweep.py) that reproduces that
measurement; the product path is ops/columns.column_min_label.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lidar_ai_recommendation_software_tpu.ops.columns import (
    OFFSETS_3X3, ColumnGrid, stripe_neighborhood_reduce)

def column_adjacency(grid: ColumnGrid, radius, allowed_pad: jnp.ndarray,
                     stripe: int = 8) -> jnp.ndarray:
    """Packed eps-adjacency: for every interior slot and each of the 9
    offsets, a uint32 whose bit k says "slot k of that neighbor column is
    an allowed eps-neighbor". Requires CAP <= 32 (one word per
    slot-offset). Precomputing this once turns every label-propagation
    sweep into pure bit-select + integer-min — no coordinate math.

    Returns (NCX, NCY, CAP, 9, CAPW) uint32 where CAPW = ceil(CAP/32)."""
    cap = grid.table_xyz.shape[2]
    assert cap % 32 == 0, "column cap must be a multiple of 32"
    capw = cap // 32
    r2 = jnp.asarray(radius, grid.table_xyz.dtype) ** 2
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))

    def fn(acc, centers, nbrs, off):
        cxyz, _ = centers
        if acc is None:
            return jnp.zeros(cxyz.shape[:-1] + (9, capw), jnp.uint32)
        kxyz, kallow = nbrs
        d2 = jnp.sum(
            (cxyz[:, :, :, None, :] - kxyz[:, :, None, :, :]) ** 2,
            axis=-1)
        hit = (d2 <= r2) & kallow[:, :, None, :]
        hw = hit.reshape(hit.shape[:-1] + (capw, 32))
        word = jnp.sum(jnp.where(hw, weights, jnp.uint32(0)), axis=-1,
                       dtype=jnp.uint32)                 # (S, NCY, CAP, CAPW)
        oi = OFFSETS_3X3.index(off)
        return acc.at[..., oi, :].set(word)

    return stripe_neighborhood_reduce(
        (grid.table_xyz, allowed_pad), fn, stripe, fills=(0.0, False))


def adjacency_counts(adj: jnp.ndarray) -> jnp.ndarray:
    """Neighbor counts from packed adjacency: popcount over offset+word."""
    return jnp.sum(jax.lax.population_count(adj).astype(jnp.int32),
                   axis=(-2, -1))


def adjacency_min_label(adj_pad: jnp.ndarray, labels_pad: jnp.ndarray,
                        int_max: int, stripe: int = 8) -> jnp.ndarray:
    """Per-slot min over labels of adjacency-set neighbor slots.

    adj_pad: padded (NCX+2, NCY+2, CAP, 9, CAPW) uint32; labels_pad: padded
    (NCX+2, NCY+2, CAP) int32. Pure integer select/min — the sweep kernel
    of connected components. The adjacency is a center-only table (sliced
    once per stripe, never per offset)."""
    cap = labels_pad.shape[2]
    capw = adj_pad.shape[-1]

    def fn(acc, centers, nbrs, off):
        _, cadj = centers
        if acc is None:
            # cadj: (S, NCY, CAP, 9, CAPW) -> acc (S, NCY, CAP)
            return jnp.full(cadj.shape[:-2], int_max, jnp.int32)
        klab, = nbrs
        oi = OFFSETS_3X3.index(off)
        word = cadj[..., oi, :]                          # (S, NCY, CAP, CAPW)
        ktiles = klab.reshape(klab.shape[:2] + (1, capw, 32))
        # statically-unrolled bit loop: broadcast shifts inside while-loop
        # bodies stall the XLA:TPU compiler (see clustering.min_sweep)
        for k in range(32):
            m = (word >> jnp.uint32(k)) & jnp.uint32(1)
            cand = jnp.where(m == 1, ktiles[..., k], int_max)
            acc = jnp.minimum(acc, jnp.min(cand, axis=-1))
        return acc

    return stripe_neighborhood_reduce(
        (labels_pad,), fn, stripe, fills=(int_max,),
        center_tables=(adj_pad,), center_fills=(0,))


def pack_slots(flags: jnp.ndarray) -> jnp.ndarray:
    """Pack a (..., CAP) bool into (..., CAP/32) uint32 words."""
    cap = flags.shape[-1]
    capw = cap // 32
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    fw = flags.reshape(flags.shape[:-1] + (capw, 32))
    return jnp.sum(jnp.where(fw, weights, jnp.uint32(0)), axis=-1,
                   dtype=jnp.uint32)

