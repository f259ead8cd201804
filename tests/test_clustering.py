"""DBSCAN-equivalence: our hash-grid label propagation must reproduce
sklearn's cluster census (SURVEY.md §7 hard part (a))."""

import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.cluster import DBSCAN

from lidar_ai_recommendation_software_tpu.ops import clustering


def _census(labels, pts):
    """Canonical cluster census: sorted list of sorted member-index
    tuples restricted to core-agnostic exact comparison via centroids."""
    cents = []
    for c in np.unique(labels[labels >= 0]):
        cents.append(tuple(np.round(pts[labels == c].mean(0), 5)))
    return sorted(cents)


def _run_ours(pts, eps, min_samples, cap=None):
    n = len(pts)
    cap = cap or 1 << (n - 1).bit_length()
    buf = np.zeros((cap, pts.shape[1]), np.float32)
    buf[:n] = pts
    mask = np.zeros(cap, bool)
    mask[:n] = True
    labels, ncl, overflow = clustering.dbscan_labels(
        jnp.asarray(buf), jnp.asarray(mask), eps, min_samples,
        ncx=128, ncy=128, column_cap=128)
    assert int(overflow) == 0
    return np.asarray(labels)[:n], int(ncl)


@pytest.mark.parametrize("seed,n,eps,ms", [(0, 800, 0.4, 5), (1, 500, 0.6, 4),
                                           (2, 1200, 0.3, 3)])
def test_dbscan_census_random(seed, n, eps, ms):
    rng = np.random.RandomState(seed)
    # mix of clusters and background noise
    centers = rng.uniform(-8, 8, (12, 3))
    cluster_pts = (centers[rng.randint(0, 12, n // 2)]
                   + rng.normal(0, 0.15, (n // 2, 3)))
    noise = rng.uniform(-10, 10, (n - n // 2, 3))
    pts = np.vstack([cluster_pts, noise]).astype(np.float32)

    sk = DBSCAN(eps=eps, min_samples=ms).fit(pts).labels_
    ours, ncl = _run_ours(pts, eps, ms)

    assert ncl == sk.max() + 1
    # noise sets can differ only in border assignment; core census must match
    assert _census(ours, pts) == _census(sk, pts)


def test_dbscan_fixture_census(fixture_points, oracle_monolith):
    pro = oracle_monolith["processed"]
    ng = pro["points"][~pro["ground_mask"]].astype(np.float32)
    sk = DBSCAN(eps=0.3, min_samples=5).fit(ng).labels_
    ours, ncl = _run_ours(ng, 0.3, 5, cap=8192)
    assert ncl == sk.max() + 1 == 446
    assert (ours == -1).sum() == (sk == -1).sum()
    assert _census(ours, ng) == _census(sk, ng)


def test_dbscan_columns_matches_bruteforce():
    """The venue-scale column-grid path must agree with the exact
    all-pairs path (and sklearn) on a spread-out venue."""
    import jax.numpy as jnp
    rng = np.random.RandomState(11)
    centers = rng.uniform(-25, 25, (150, 2))
    n = 3000
    pts = np.zeros((n, 3), np.float32)
    pts[:, :2] = centers[rng.randint(0, 150, n)] + rng.normal(0, 0.12,
                                                              (n, 2))
    pts[:, 2] = rng.uniform(0, 1.8, n)
    cap = 4096
    buf = np.zeros((cap, 3), np.float32)
    buf[:n] = pts
    mask = np.zeros(cap, bool)
    mask[:n] = True
    sk = DBSCAN(eps=0.35, min_samples=5).fit(pts).labels_
    lab_c, ncl_c, ovf = clustering.dbscan_columns(
        jnp.asarray(buf), jnp.asarray(mask), 0.35, 5,
        ncx=128, ncy=128, column_cap=64)
    assert int(ovf) == 0
    lab_c = np.asarray(lab_c)[:n]
    assert int(ncl_c) == sk.max() + 1
    assert _census(lab_c, pts) == _census(sk, pts)


def test_cluster_centroids_segment_mean():
    pts = jnp.asarray(np.array([[0, 0, 0], [2, 0, 0], [0, 4, 0], [9, 9, 9]],
                               np.float32))
    labels = jnp.asarray(np.array([0, 0, 1, -1], np.int32))
    cents, valid, overflow = clustering.cluster_centroids(pts, labels, 4)
    cents, valid = np.asarray(cents), np.asarray(valid)
    assert valid.tolist() == [True, True, False, False]
    assert int(overflow) == 0
    np.testing.assert_allclose(cents[0], [1, 0, 0])
    np.testing.assert_allclose(cents[1], [0, 4, 0])


def test_cluster_centroids_overflow_count():
    """Cluster ids >= capacity are counted, not silently dropped."""
    pts = jnp.asarray(np.arange(18, dtype=np.float32).reshape(6, 3))
    labels = jnp.asarray(np.array([0, 1, 2, 3, 4, 5], np.int32))
    cents, valid, overflow = clustering.cluster_centroids(pts, labels, 4)
    assert int(overflow) == 2  # ids 4 and 5 spill past capacity 4
    assert np.asarray(valid).sum() == 4


def test_dbscan_gs_matches_columns_and_sklearn():
    """The Pallas Gauss-Seidel CCL (interpret mode on CPU) reaches the
    same fixpoint as the jnp column path and sklearn's census — min-
    propagation has a unique fixpoint, so update order cannot matter."""
    from lidar_ai_recommendation_software_tpu.ops import ccl

    rng = np.random.RandomState(7)
    centers = rng.uniform(-10, 10, (40, 2))
    n = 1500
    pts = np.zeros((n, 3), np.float32)
    pts[:, :2] = centers[rng.randint(0, 40, n)] + rng.normal(0, 0.1, (n, 2))
    pts[:, 2] = rng.uniform(0, 1.8, n)
    cap = 2048
    buf = np.zeros((cap, 3), np.float32)
    buf[:n] = pts
    mask = np.zeros(cap, bool)
    mask[:n] = True

    lab_ref, k_ref, _ = clustering.dbscan_columns(
        jnp.asarray(buf), jnp.asarray(mask), 0.35, 5,
        ncx=64, ncy=64, column_cap=64)
    lab_gs, k_gs, ovf = ccl.dbscan_gs(
        jnp.asarray(buf), jnp.asarray(mask), 0.35, 5,
        ncx=64, ncy=64, column_cap=64)
    assert int(ovf) == 0
    assert int(k_gs) == int(k_ref)
    assert (np.asarray(lab_gs) == np.asarray(lab_ref)).all()

    sk = DBSCAN(eps=0.35, min_samples=5).fit(pts).labels_
    assert int(k_gs) == sk.max() + 1
    assert _census(np.asarray(lab_gs)[:n], pts) == _census(sk, pts)
