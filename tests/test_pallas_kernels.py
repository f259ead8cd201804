"""Pallas kernel correctness vs jnp oracles (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_ai_recommendation_software_tpu.ops.pallas import kernels as K
from lidar_ai_recommendation_software_tpu.ops.sampling import (
    farthest_point_sampling)


class TestRadiusCount:
    def test_matches_reference(self):
        rng = np.random.RandomState(0)
        centers = jnp.asarray(rng.uniform(-10, 10, (700, 2)), jnp.float32)
        people = jnp.asarray(rng.uniform(-10, 10, (300, 2)), jnp.float32)
        pmask = jnp.asarray(np.arange(300) < 250)
        got = K.radius_count(centers, people, pmask, 2.0, tile=256)
        want = K.radius_count_reference(centers, people, pmask, 2.0)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_empty_people(self):
        centers = jnp.zeros((16, 2), jnp.float32)
        people = jnp.zeros((8, 2), jnp.float32)
        got = K.radius_count(centers, people, jnp.zeros(8, bool), 1.0,
                             tile=16)
        assert np.asarray(got).sum() == 0


class TestSAMLPPool:
    def test_matches_reference(self):
        rng = np.random.RandomState(1)
        m, k, cin = 100, 16, 6
        grouped = jnp.asarray(rng.randn(m, k, cin), jnp.float32)
        valid = jnp.asarray(rng.rand(m, k) > 0.3)
        dims = [cin, 16, 16, 32]
        weights = []
        for a, b in zip(dims[:-1], dims[1:]):
            weights.append((jnp.asarray(rng.randn(a, b) * 0.2, jnp.float32),
                            jnp.asarray(rng.randn(b) * 0.1, jnp.float32)))
        got = K.sa_mlp_pool(grouped, valid, weights, tile=32)
        want = K.sa_mlp_pool_reference(grouped, valid, weights)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_empty_neighborhood_zeroed(self):
        m, k, cin = 8, 4, 3
        grouped = jnp.ones((m, k, cin), jnp.float32)
        valid = jnp.zeros((m, k), bool).at[0].set(True)
        weights = [(jnp.eye(3, 8, dtype=jnp.float32),
                    jnp.zeros(8, jnp.float32)),
                   (jnp.eye(8, 8, dtype=jnp.float32),
                    jnp.zeros(8, jnp.float32)),
                   (jnp.eye(8, 8, dtype=jnp.float32),
                    jnp.zeros(8, jnp.float32))]
        got = np.asarray(K.sa_mlp_pool(grouped, valid, weights, tile=8))
        assert np.all(got[1:] == 0.0)
        assert np.any(got[0] != 0.0)


class TestCrowdNetFusedPath:
    """CrowdNet(use_pallas=True) must match the differentiable jnp path
    with the same parameters — the fused kernels are the serving path."""

    def test_forward_equivalence(self):
        from lidar_ai_recommendation_software_tpu.models.crowdnet import (
            CrowdNet)

        rng = np.random.RandomState(3)
        n = 512
        pts = jnp.asarray(rng.uniform(-8, 8, (n, 3)), jnp.float32)
        mask = jnp.asarray(np.arange(n) < 480)
        vmin = jnp.asarray([-8.0, -8.0], jnp.float32)
        vsize = jnp.asarray(16.0, jnp.float32)

        kw = dict(sa1_samples=128, sa2_samples=32, grid=16)
        ref_net = CrowdNet(use_pallas=False, **kw)
        params = ref_net.init(jax.random.PRNGKey(0), pts, mask, vmin,
                              vsize)
        want = ref_net.apply(params, pts, mask, vmin, vsize)
        got = CrowdNet(use_pallas=True, **kw).apply(
            params, pts, mask, vmin, vsize)
        for key in ("density", "flow", "congestion"):
            np.testing.assert_allclose(np.asarray(got[key]),
                                       np.asarray(want[key]),
                                       atol=1e-4, rtol=1e-4)


class TestFPS:
    def test_matches_jnp_fps(self):
        rng = np.random.RandomState(2)
        pts = jnp.asarray(rng.uniform(-5, 5, (256, 3)), jnp.float32)
        mask = jnp.asarray(np.arange(256) < 200)
        got = np.asarray(K.fps(pts, mask, 32))
        want = np.asarray(farthest_point_sampling(pts, mask, 32))
        np.testing.assert_array_equal(got, want)

    def test_spreads_over_cloud(self):
        # FPS on a line must pick the two endpoints early
        pts = jnp.asarray(
            np.stack([np.linspace(0, 10, 128),
                      np.zeros(128), np.zeros(128)], 1), jnp.float32)
        mask = jnp.ones(128, bool)
        sel = np.asarray(K.fps(pts, mask, 4))
        assert 0 in sel and 127 in sel

    def test_batched_and_vmap_match_single(self):
        # auto-vmap of the 1D-SMEM-output kernel is illegal on TPU; the
        # custom_vmap rule must route to the batched grid kernel with
        # identical selections (this is the path CrowdNet's lifted vmap
        # takes in training/serving)
        rng = np.random.RandomState(3)
        pts = jnp.asarray(rng.uniform(-5, 5, (4, 300, 3)), jnp.float32)
        mask = jnp.asarray(rng.rand(4, 300) > 0.15)
        singles = np.stack(
            [np.asarray(K.fps(pts[i], mask[i], 24)) for i in range(4)])
        batched = np.asarray(K.fps(pts, mask, 24))
        vmapped = np.asarray(jax.jit(
            jax.vmap(lambda p, m: K.fps(p, m, 24)))(pts, mask))
        np.testing.assert_array_equal(singles, batched)
        np.testing.assert_array_equal(singles, vmapped)
