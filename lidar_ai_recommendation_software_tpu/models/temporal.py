"""Temporal crowd-flow estimation from point-cloud sequences.

The reference *simulates* its flow field because it never ingests more
than one frame ("In a real implementation, this would be derived from
sequential point clouds", crowd_flow_model.py:19-26). This module supplies
that real implementation: given consecutive frames, people are tracked by
nearest-centroid matching and the resulting velocities are averaged onto
the 1 m analysis lattice, producing a ``FlowResults``-shaped output that
drops into the same recommendations/report stack (and the BASELINE.md
config-3 benchmark: multi-frame temporal flow-vector prediction).

All steps are masked dense ops under jit: the (K, K) assignment problem is
solved greedily by distance-argmin with a mutual-match check — exact for
the crowd regime where inter-person spacing >> per-frame displacement.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from lidar_ai_recommendation_software_tpu.config import PipelineConfig
from lidar_ai_recommendation_software_tpu.types import FlowResults, People


def match_people(prev: People, curr: People, max_dist: float
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy mutual nearest-neighbor matching.

    Returns (match_idx (K,) int32 into prev for each current person,
    matched (K,) bool). A pair matches when each is the other's nearest
    and the distance is below ``max_dist``."""
    d2 = jnp.sum(
        (curr.positions[:, None, :] - prev.positions[None, :, :]) ** 2,
        axis=-1)
    big = jnp.asarray(1e18, d2.dtype)
    d2 = jnp.where(curr.mask[:, None] & prev.mask[None, :], d2, big)
    fwd = jnp.argmin(d2, axis=1)                 # curr -> prev
    bwd = jnp.argmin(d2, axis=0)                 # prev -> curr
    k = curr.positions.shape[0]
    mutual = bwd[fwd] == jnp.arange(k)
    close = d2[jnp.arange(k), fwd] <= max_dist * max_dist
    return fwd.astype(jnp.int32), mutual & close & curr.mask


def frame_velocities(prev: People, curr: People, dt: float,
                     max_speed: float = 3.0) -> Tuple[jnp.ndarray,
                                                      jnp.ndarray]:
    """Per-person velocity between two frames. Returns
    (velocities (K, 2), valid (K,))."""
    idx, ok = match_people(prev, curr, max_dist=max_speed * dt)
    vel = (curr.positions - prev.positions[idx]) / dt
    return jnp.where(ok[:, None], vel, 0.0), ok


@functools.partial(jax.jit, static_argnames=("config",))
def temporal_flow(prev: People, curr: People, dt: float,
                  mins: jnp.ndarray, maxs: jnp.ndarray,
                  config: PipelineConfig) -> FlowResults:
    """Flow field from two tracked frames on the analysis lattice.

    Grid-node vectors are the mean velocity of people within the node's
    cell neighborhood (radius = grid_size); nodes without nearby tracked
    people carry zero vectors and are excluded from the stats, mirroring
    how the reference handles empty regions."""
    fc = config.flow
    cap = config.capacity
    vel, ok = frame_velocities(prev, curr, dt,
                               max_speed=fc.track_max_speed)

    g = jnp.asarray(fc.grid_size, curr.positions.dtype)
    gx, gy = cap.grid_cells_x, cap.grid_cells_y
    x0, y0 = mins[0], mins[1]
    nx = jnp.clip(jnp.ceil((maxs[0] + g - x0) / g).astype(jnp.int32),
                  1, gx)
    ny = jnp.clip(jnp.ceil((maxs[1] + g - y0) / g).astype(jnp.int32),
                  1, gy)

    ii = jnp.arange(gx, dtype=g.dtype)
    jj = jnp.arange(gy, dtype=g.dtype)
    px = jnp.broadcast_to((x0 + ii * g)[:, None], (gx, gy))
    py = jnp.broadcast_to((y0 + jj * g)[None, :], (gx, gy))
    valid = (jnp.arange(gx)[:, None] < nx) & (jnp.arange(gy)[None, :] < ny)

    # mean velocity of tracked people within grid_size of each node
    nodes = jnp.stack([px.reshape(-1), py.reshape(-1)], axis=1)
    d2 = jnp.sum((nodes[:, None, :] - curr.positions[None, :, :]) ** 2,
                 axis=-1)
    near = (d2 <= g * g) & ok[None, :]
    wsum = jnp.sum(near[..., None] * vel[None, :, :], axis=1)
    cnt = jnp.sum(near, axis=1)
    vectors = (wsum / jnp.maximum(cnt, 1)[:, None]).reshape(gx, gy, 2)
    occupied = (cnt > 0).reshape(gx, gy) & valid
    vectors = jnp.where(occupied[..., None], vectors, 0.0)
    mags = jnp.sqrt(jnp.sum(vectors ** 2, axis=-1))

    ocount = jnp.maximum(jnp.sum(occupied), 1)
    avg_speed = jnp.sum(jnp.where(occupied, mags, 0.0)) / ocount
    mean_vec = jnp.sum(jnp.where(occupied[..., None], vectors, 0.0),
                       axis=(0, 1)) / ocount

    # congestion-style bottlenecks: slow occupied nodes next to faster
    # flow, reusing the monolith stencil rule on the measured field
    from lidar_ai_recommendation_software_tpu.models.flow import (
        _bottlenecks_monolith)
    sev, ok_b = _bottlenecks_monolith(mags, occupied, config)

    fx = px.T.reshape(-1)
    fy = py.T.reshape(-1)
    scores = jnp.where(ok_b.T.reshape(-1), sev.T.reshape(-1), -1)
    top_v, top_i = jax.lax.top_k(scores, fc.max_bottlenecks)
    bmask = top_v >= 0

    return FlowResults(
        positions=jnp.stack([fx, fy], axis=1),
        vectors=vectors.transpose(1, 0, 2).reshape(-1, 2),
        magnitudes=mags.T.reshape(-1),
        node_mask=occupied.T.reshape(-1),
        avg_speed=avg_speed,
        mean_vector=mean_vec,
        bottleneck_xy=jnp.stack([fx[top_i], fy[top_i]], axis=1),
        bottleneck_severity=jnp.where(bmask, top_v, 0),
        bottleneck_mask=bmask)
