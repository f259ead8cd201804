"""Synthetic venue generators.

``sample_venue`` reproduces — bit-for-bit, including NumPy RNG consumption
order — the reference's de-facto golden fixture: the seed-42 synthetic point
cloud built inline in the monolith app (app_simplified.py:994-1024 /
app_with_db.py:1020-1050): 10,000 points uniform in ±15 m xy, sinusoidal
terrain ``0.1 sin(0.5x) cos(0.5y)``, 50 person clusters of radius 0.3 m with
per-point heights drawn uniform in [0.1, 1.8].

``scaled_venue`` generalises the same recipe to arbitrary sizes for
benchmarking (100K / 1M / 10M points per BASELINE.md protocol).
"""

from __future__ import annotations

import numpy as np


def sample_venue(n_points: int = 10000, n_people: int = 50,
                 extent: float = 15.0, people_extent: float = 10.0,
                 person_radius: float = 0.3, seed: int = 42) -> np.ndarray:
    """The reference golden fixture (defaults = app_simplified.py:994-1024).

    RNG draw order matches the reference exactly: x (n), y (n),
    people_centers (n_people, 2), then one height draw per point that falls
    within ``person_radius`` of its nearest person centre, in point order.
    """
    rng = np.random
    rng.seed(seed)
    x = rng.uniform(-extent, extent, n_points)
    y = rng.uniform(-extent, extent, n_points)
    z = 0.1 * np.sin(x * 0.5) * np.cos(y * 0.5)

    centers = rng.uniform(-people_extent, people_extent, (n_people, 2))

    # Nearest-centre distance per point. Up to 100k points: vectorised
    # chunked form, bit-identical to the reference's per-point loop (the
    # parity fixture lives here). Beyond that: cKDTree nearest-neighbour —
    # same exact minimum distance, ~100x faster than the O(n*people)
    # dense pass (which takes ~20 min of NumPy at 10M points).
    if n_points <= 100_000:
        person_mask = np.empty(n_points, dtype=bool)
        chunk = max(1, min(n_points, (1 << 24) // max(1, n_people)))
        for s in range(0, n_points, chunk):
            e = min(n_points, s + chunk)
            d2 = ((x[s:e, None] - centers[None, :, 0]) ** 2
                  + (y[s:e, None] - centers[None, :, 1]) ** 2)
            person_mask[s:e] = np.sqrt(d2.min(axis=1)) < person_radius
    else:
        from scipy.spatial import cKDTree
        dist, _ = cKDTree(centers).query(np.column_stack((x, y)), k=1)
        person_mask = dist < person_radius

    # The reference draws one uniform per in-person point, in increasing
    # point order — replicate the stream consumption.
    heights = rng.uniform(0.1, 1.8, int(person_mask.sum()))
    z = z.copy()
    z[person_mask] = heights

    return np.column_stack((x, y, z))


def venue_sequence(n_frames: int = 5, dt: float = 0.5,
                   n_points: int = 10000, n_people: int = 50,
                   extent: float = 15.0, speed: float = 1.0,
                   person_points: int = 40, seed: int = 42) -> list:
    """A temporal sequence of venue frames with people drifting toward the
    right-edge exit at ``speed`` m/s (plus small per-person jitter) — the
    input the reference never has (its flow is simulated,
    crowd_flow_model.py:19-26).

    Unlike the density fixture (which, faithfully to the reference,
    leaves only ~3 uniform samples per person — below DBSCAN's
    min_samples, so 'people' there are terrain speckle), each person here
    carries ``person_points`` dedicated returns, the realistic LiDAR
    regime, so person clusters are dense, stable across frames and
    trackable. Terrain resamples per frame; person columns move
    coherently."""
    rng = np.random.RandomState(seed)
    centers = rng.uniform(-extent * 0.66, extent * 0.66, (n_people, 2))
    jitter = rng.normal(0, 0.1 * speed, (n_people, 2))
    n_terrain = max(0, n_points - n_people * person_points)
    frames = []
    for t in range(n_frames):
        frng = np.random.RandomState(seed + 1000 + t)
        x = frng.uniform(-extent, extent, n_terrain)
        y = frng.uniform(-extent, extent, n_terrain)
        z = 0.1 * np.sin(x * 0.5) * np.cos(y * 0.5)
        # direction toward exit at (extent, 0)
        d = np.stack([extent - centers[:, 0], -centers[:, 1]], 1)
        d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-9)
        vel = d * speed + jitter
        pos = centers + vel * dt * t
        px = (pos[:, 0:1]
              + frng.normal(0, 0.1, (n_people, person_points))).ravel()
        py = (pos[:, 1:2]
              + frng.normal(0, 0.1, (n_people, person_points))).ravel()
        pz = frng.uniform(0.1, 1.8, n_people * person_points)
        frames.append(np.column_stack((
            np.concatenate([x, px]), np.concatenate([y, py]),
            np.concatenate([z, pz]))))
    return frames


def scaled_venue(n_points: int, seed: int = 42,
                 people_per_100m2: float = 0.56) -> np.ndarray:
    """A benchmark venue scaled so crowd statistics stay realistic.

    The golden fixture has 50 people in a 30x30 m venue. We grow the venue
    area linearly with the point count (constant ~11 pts/m^2 sampling
    density) and keep the same people-per-area, so clustering workload grows
    linearly and density stats stay in the reference's regime.

    Multi-million-point venues take minutes of single-thread NumPy to
    generate (the nearest-person-centre pass is O(n * people)), so
    deterministic large venues are cached as .npy under
    ``$LIDAR_VENUE_CACHE`` (default /tmp/lidar_venues; set to empty to
    disable). Only venues >= 1M points are cached; test-sized fixtures
    always regenerate.
    """
    import os

    cache_dir = os.environ.get("LIDAR_VENUE_CACHE", "/tmp/lidar_venues")
    path = None
    if cache_dir and n_points >= 1_000_000:
        path = os.path.join(
            cache_dir, f"venue_{n_points}_{seed}_{people_per_100m2}.npy")
        if os.path.exists(path):
            try:
                return np.load(path)
            except Exception:
                pass  # corrupt/partial cache entry: regenerate

    base_area = 30.0 * 30.0
    base_points = 10000.0
    area = base_area * (n_points / base_points)
    extent = float(np.sqrt(area) / 2.0)
    n_people = max(1, int(people_per_100m2 * area / 100.0))
    pts = sample_venue(
        n_points=n_points, n_people=n_people, extent=extent,
        people_extent=max(1.0, extent - 5.0), seed=seed,
    )
    if path:
        try:
            os.makedirs(cache_dir, exist_ok=True)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:  # np.save(path) would append .npy
                np.save(f, pts)
            os.replace(tmp, path)
        except Exception:
            pass
    return pts
