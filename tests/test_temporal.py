"""Temporal flow: tracking + field estimation."""

import jax.numpy as jnp
import numpy as np

from lidar_ai_recommendation_software_tpu.config import MONOLITH_CONFIG
from lidar_ai_recommendation_software_tpu.models import temporal
from lidar_ai_recommendation_software_tpu.types import People


def _people(xy, cap=64, z=1.0):
    buf = np.zeros((cap, 2), np.float32)
    buf[:len(xy)] = xy
    m = np.zeros(cap, bool)
    m[:len(xy)] = True
    zz = np.full(cap, z, np.float32)
    return People(positions=jnp.asarray(buf), mask=jnp.asarray(m),
                  z=jnp.asarray(zz))


def test_matching_recovers_known_motion():
    rng = np.random.RandomState(0)
    prev_xy = rng.uniform(-10, 10, (20, 2))
    vel = np.array([1.0, 0.5])
    curr_xy = prev_xy + vel * 0.5  # dt = 0.5 s
    prev, curr = _people(prev_xy), _people(curr_xy)
    v, ok = temporal.frame_velocities(prev, curr, dt=0.5)
    v, ok = np.asarray(v), np.asarray(ok)
    assert ok[:20].all() and not ok[20:].any()
    np.testing.assert_allclose(v[:20], np.tile(vel, (20, 1)), atol=1e-5)


def test_matching_rejects_teleports():
    prev = _people(np.array([[0.0, 0.0]]))
    curr = _people(np.array([[50.0, 50.0]]))  # impossible jump
    _, ok = temporal.frame_velocities(prev, curr, dt=0.1)
    assert not np.asarray(ok).any()


def test_temporal_flow_field():
    # well-separated crowd (spacing >> per-frame displacement, the NN
    # tracking regime): 5x6 lattice with jitter, everyone moving +x
    rng = np.random.RandomState(1)
    gx, gy = np.meshgrid(np.linspace(-10, 10, 6), np.linspace(-8, 8, 5))
    prev_xy = (np.stack([gx.ravel(), gy.ravel()], 1)
               + rng.uniform(-0.4, 0.4, (30, 2)))
    curr_xy = prev_xy + np.array([0.6, 0.0])
    cap = MONOLITH_CONFIG.capacity.max_people
    prev, curr = _people(prev_xy, cap), _people(curr_xy, cap)
    res = temporal.temporal_flow(
        prev, curr, 1.0,
        jnp.asarray([-12.0, -12.0], jnp.float32),
        jnp.asarray([12.0, 12.0], jnp.float32), MONOLITH_CONFIG)
    d = res.to_host_dict()
    assert d["dominant_direction"] == "E"
    assert abs(d["avg_speed"] - 0.6) < 1e-4
    # all measured vectors point +x
    vec = d["flow_vectors"]["vectors"]
    assert len(vec) > 0
    np.testing.assert_allclose(vec[:, 1], 0.0, atol=1e-5)
    assert (vec[:, 0] > 0).all()


def test_multi_frame_averages_all_pairs():
    """temporal_flow_multi must use every consecutive pair: with noisy
    per-pair displacements around a constant drift, the multi-frame
    average is closer to truth than the worst single pair."""
    rng = np.random.RandomState(2)
    gx, gy = np.meshgrid(np.linspace(-10, 10, 6), np.linspace(-8, 8, 5))
    base = (np.stack([gx.ravel(), gy.ravel()], 1)
            + rng.uniform(-0.4, 0.4, (30, 2)))
    drift = np.array([0.5, 0.0])
    cap = MONOLITH_CONFIG.capacity.max_people
    frames_xy = []
    pos = base.copy()
    for t in range(5):
        frames_xy.append(pos.copy())
        pos = pos + drift + rng.normal(0, 0.1, (30, 2))  # noisy steps
    seq = [ _people(xy, cap) for xy in frames_xy ]
    import jax
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *seq)
    mins = jnp.asarray([-14.0, -12.0], jnp.float32)
    maxs = jnp.asarray([16.0, 12.0], jnp.float32)
    multi = temporal.temporal_flow_multi(
        stacked, 1.0, mins, maxs, MONOLITH_CONFIG).to_host_dict()
    assert multi["dominant_direction"] == "E"
    # averaging 4 pairs: mean speed within the noise-reduced band
    assert abs(multi["avg_speed"] - 0.5) < 0.1
    # two-frame wrapper == multi on the same two frames
    two = temporal.temporal_flow(
        seq[0], seq[1], 1.0, mins, maxs, MONOLITH_CONFIG).to_host_dict()
    pair = temporal.temporal_flow_multi(
        jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), seq[0], seq[1]),
        1.0, mins, maxs, MONOLITH_CONFIG).to_host_dict()
    np.testing.assert_allclose(two["flow_vectors"]["vectors"],
                               pair["flow_vectors"]["vectors"])


def test_analyze_sequence_uses_all_frames():
    """Pipeline.analyze_sequence tracks the whole sequence (not just the
    last pair) and measures the generator's known motion."""
    from lidar_ai_recommendation_software_tpu.pipeline import Pipeline
    from lidar_ai_recommendation_software_tpu.synthetic import (
        venue_sequence)

    frames = venue_sequence(n_frames=4, dt=0.5, n_points=8000,
                            n_people=40, extent=15.0, speed=1.0)
    out = Pipeline().analyze_sequence(frames, dt=0.5)
    f = out["flow"]
    vec = np.asarray(f["flow_vectors"]["positions"])
    v = np.asarray(f["flow_vectors"]["vectors"])
    vn = np.linalg.norm(v, axis=1)
    ok = vn > 0.05
    assert ok.any()
    # generator truth: motion toward the exit at (extent, 0)
    gt = np.stack([15.0 - vec[:, 0], -vec[:, 1]], 1)
    gt /= np.maximum(np.linalg.norm(gt, axis=1, keepdims=True), 1e-9)
    cos = float(np.mean(np.sum(v[ok] / vn[ok, None] * gt[ok], axis=1)))
    assert cos > 0.9, cos
    assert 0.2 < f["avg_speed"] < 2.0
