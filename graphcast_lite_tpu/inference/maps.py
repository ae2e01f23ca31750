"""Per-pixel metric maps and comparison figures.

~ reference ``scripts/metrics_maps.py`` (per-pixel RMSE/MAE/BIAS/ACC maps
from a saved predictions file), ``plot_region_multires.py`` (scatter maps
for flat grids) and the comparison figure scripts.  Matplotlib with the Agg
backend; every function can also return the raw metric fields without
plotting.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

__all__ = ["pixel_metrics", "plot_metric_maps", "plot_flat_scatter"]


def pixel_metrics(
    predictions: np.ndarray,     # [N, G, C] or [N, G, P·C]
    ground_truth: np.ndarray,
    num_channels: int,
) -> Dict[str, np.ndarray]:
    """Per-node metrics over the sample axis: RMSE, MAE, BIAS [G, C]
    (horizons pooled per channel) and temporal ACC [G, C]."""
    n, g, cp = predictions.shape
    p = cp // num_channels
    pr = predictions.reshape(n, g, p, num_channels)
    gt = ground_truth.reshape(n, g, p, num_channels)
    err = pr - gt
    rmse = np.sqrt((err**2).mean(axis=(0, 2)))
    mae = np.abs(err).mean(axis=(0, 2))
    bias = err.mean(axis=(0, 2))
    pa = pr - pr.mean(axis=0, keepdims=True)
    ga = gt - gt.mean(axis=0, keepdims=True)
    denom = (
        np.sqrt((pa**2).sum(axis=0)) * np.sqrt((ga**2).sum(axis=0)) + 1e-9
    )
    acc = ((pa * ga).sum(axis=0) / denom).mean(axis=1)
    return {"rmse": rmse, "mae": mae, "bias": bias, "acc": acc}


def plot_metric_maps(
    metrics: Dict[str, np.ndarray],
    lats: np.ndarray,
    lons: np.ndarray,
    channel: int,
    out_path: str,
    title: str = "",
) -> str:
    """4-panel (RMSE/MAE/BIAS/ACC) map figure for one channel."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 2, figsize=(12, 6), constrained_layout=True)
    panels = [("rmse", "RMSE"), ("mae", "MAE"), ("bias", "BIAS"),
              ("acc", "ACC")]
    for ax, (key, label) in zip(axes.ravel(), panels):
        field = metrics[key][:, channel].reshape(len(lats), len(lons))
        cmap = "coolwarm" if key == "bias" else "viridis"
        im = ax.pcolormesh(lons, lats, field, cmap=cmap, shading="auto")
        ax.set_title(f"{label} {title}")
        fig.colorbar(im, ax=ax, shrink=0.85)
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path


def plot_flat_scatter(
    values: np.ndarray,            # [G]
    node_lats: np.ndarray,
    node_lons: np.ndarray,
    out_path: str,
    title: str = "",
    is_regional: Optional[np.ndarray] = None,
) -> str:
    """Scatter map for flat multires grids (point size marks resolution)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 5), constrained_layout=True)
    size = np.full(len(values), 6.0)
    if is_regional is not None:
        size = np.where(is_regional, 2.0, 6.0)
    sc = ax.scatter(node_lons, node_lats, c=values, s=size, cmap="viridis")
    ax.set_title(title)
    ax.set_xlabel("lon")
    ax.set_ylabel("lat")
    fig.colorbar(sc, ax=ax, shrink=0.85)
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path
