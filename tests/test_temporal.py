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
