"""Visualization builders (matplotlib).

Host-side figure builders mirroring utils/visualization.py of the
reference (plotly there; matplotlib here — plotly/kaleido are not in the
image, and matplotlib renders PNGs for the report without an external
binary, unlike the reference's kaleido subprocess,
report_generator.py:482-496):

  - point_cloud_figure      ~ visualize_point_cloud (visualization.py:10-97)
  - density_heatmap_figure  ~ create_density_heatmap (:99-191)
  - flow_figure             ~ create_flow_visualization (:193-278)
  - congestion_figure       ~ plot_crowd_metrics (:280-377)

Downsampling rules match the reference: >50K points renders 20% (5% in
preview mode), visualization.py:29-33.
"""

from __future__ import annotations

import base64
import io
from typing import Dict, Optional

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib import cm  # noqa: E402


def _downsample(points: np.ndarray, preview: bool,
                threshold: int = 50_000) -> np.ndarray:
    if len(points) <= threshold and not preview:
        return points
    frac = 0.05 if preview else (0.2 if len(points) > threshold else 1.0)
    if frac >= 1.0:
        return points
    n_keep = max(1, int(len(points) * frac))
    idx = np.random.default_rng(0).choice(len(points), n_keep,
                                          replace=False)
    return points[idx]


def point_cloud_figure(points: np.ndarray,
                       clusters: Optional[np.ndarray] = None,
                       color_by: str = "Height", point_size: float = 2.0,
                       preview: bool = False):
    """3D scatter with the reference's color modes
    (visualization.py:38-70): Height / Density / Distance / Cluster."""
    pts = np.asarray(points)
    keep_idx = None
    if clusters is not None:
        clusters = np.asarray(clusters)
    if len(pts) > 50_000 or preview:
        frac = 0.05 if preview else 0.2
        n_keep = max(1, int(len(pts) * frac))
        keep_idx = np.random.default_rng(0).choice(len(pts), n_keep,
                                                   replace=False)
        pts = pts[keep_idx]
        if clusters is not None:
            clusters = clusters[keep_idx]

    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(projection="3d")
    if color_by == "Cluster" and clusters is not None:
        c = np.where(clusters < 0, -1, clusters)
        sc = ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=c,
                        cmap="tab20", s=point_size)
    elif color_by == "Density":
        # local density via 2D histogram lookup (cheap stand-in for the
        # KD-tree radius count the reference uses, visualization.py:43-45)
        h, xe, ye = np.histogram2d(pts[:, 0], pts[:, 1], bins=50)
        ix = np.clip(np.searchsorted(xe, pts[:, 0]) - 1, 0, 49)
        iy = np.clip(np.searchsorted(ye, pts[:, 1]) - 1, 0, 49)
        sc = ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=h[ix, iy],
                        cmap="viridis", s=point_size)
    elif color_by == "Distance":
        center = pts.mean(axis=0)
        d = np.linalg.norm(pts - center, axis=1)
        sc = ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=d,
                        cmap="plasma", s=point_size)
    else:  # Height
        sc = ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=pts[:, 2],
                        cmap="viridis", s=point_size)
    fig.colorbar(sc, ax=ax, shrink=0.6, label=color_by)
    ax.set_xlabel("X (m)")
    ax.set_ylabel("Y (m)")
    ax.set_zlabel("Z (m)")
    ax.set_title("Point cloud")
    return fig


def density_heatmap_figure(density_results: Dict):
    """Density heatmap from the analysis grid
    (visualization.py:99-191 'density_map' branch)."""
    grid = np.asarray(density_results.get("density_map",
                      density_results.get("density_grid")))
    if grid.ndim != 2:
        raise ValueError("density_results lacks a 2D grid")
    # orient x horizontally: stored maps are either (nx, ny) or (ny, nx);
    # both render — transpose the monolith's y-major grid
    if "density_map" not in density_results:
        grid = grid.T
    fig, ax = plt.subplots(figsize=(8, 6))
    origin = density_results.get("origin")
    extent = None
    if origin is not None:
        g = 1.0
        extent = (origin[0], origin[0] + grid.shape[0] * g,
                  origin[1], origin[1] + grid.shape[1] * g)
    im = ax.imshow(grid.T, origin="lower", cmap="hot", extent=extent,
                   aspect="auto")
    fig.colorbar(im, ax=ax, label="people/m²")
    for h in density_results.get("hotspots", []):
        ax.plot(h["x"], h["y"], "c*", markersize=14, markeredgecolor="k")
    ax.set_xlabel("X (m)")
    ax.set_ylabel("Y (m)")
    ax.set_title("Crowd density")
    return fig


def flow_figure(flow_results: Dict, max_arrows: int = 100):
    """Speed heatmap + flow arrows (visualization.py:193-278: magnitude
    interpolation + <=100 arrow traces, skipping vectors under 0.1)."""
    fv = flow_results["flow_vectors"]
    pos = np.asarray(fv["positions"])
    vec = np.asarray(fv["vectors"])
    mag = np.asarray(fv["magnitudes"])
    fig, ax = plt.subplots(figsize=(8, 6))
    if len(pos):
        sc = ax.tricontourf(pos[:, 0], pos[:, 1], mag, levels=14,
                            cmap="viridis")
        fig.colorbar(sc, ax=ax, label="speed (m/s)")
        keep = mag >= 0.1
        idx = np.where(keep)[0]
        if len(idx) > max_arrows:
            idx = idx[np.linspace(0, len(idx) - 1, max_arrows).astype(int)]
        ax.quiver(pos[idx, 0], pos[idx, 1], vec[idx, 0], vec[idx, 1],
                  color="red", width=0.003)
    for b in flow_results.get("bottlenecks", []):
        ax.plot(b["x"], b["y"], "ws", markersize=10, markeredgecolor="k")
        ax.annotate(f'{b["severity"]}', (b["x"], b["y"]),
                    ha="center", va="center", fontsize=8)
    ax.set_xlabel("X (m)")
    ax.set_ylabel("Y (m)")
    ax.set_title("Crowd flow")
    return fig


def congestion_figure(density_results: Dict, flow_results: Dict):
    """Congestion risk = density / (speed + 0.1), normalised 0-10
    (visualization.py:322-326), bubble chart over the venue."""
    fv = flow_results["flow_vectors"]
    pos = np.asarray(fv["positions"])
    mag = np.asarray(fv["magnitudes"])
    grid = np.asarray(density_results.get("density_map",
                      density_results.get("density_grid")))
    if "density_map" not in density_results:
        grid = grid.T
    origin = density_results.get("origin", (pos[:, 0].min() if len(pos)
                                            else 0.0,
                                            pos[:, 1].min() if len(pos)
                                            else 0.0))
    fig, ax = plt.subplots(figsize=(8, 6))
    if len(pos):
        ix = np.clip(((pos[:, 0] - origin[0])).astype(int), 0,
                     grid.shape[0] - 1)
        iy = np.clip(((pos[:, 1] - origin[1])).astype(int), 0,
                     grid.shape[1] - 1)
        dens = grid[ix, iy]
        risk = dens / (mag + 0.1)
        rmax = risk.max() if risk.max() > 0 else 1.0
        risk10 = 10.0 * risk / rmax
        sc = ax.scatter(pos[:, 0], pos[:, 1], s=8 + risk10 * 12,
                        c=risk10, cmap="RdYlGn_r", alpha=0.75)
        fig.colorbar(sc, ax=ax, label="congestion risk (0-10)")
    ax.set_xlabel("X (m)")
    ax.set_ylabel("Y (m)")
    ax.set_title("Congestion risk")
    return fig


def fig_to_base64(fig) -> str:
    """PNG-in-base64 for report embedding (report_generator.py:482-496 —
    no kaleido subprocess needed)."""
    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=110, bbox_inches="tight")
    plt.close(fig)
    return base64.b64encode(buf.getvalue()).decode("ascii")
