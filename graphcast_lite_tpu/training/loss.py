"""Loss machinery: latitude weighting, masks, weighted MSE, ACC.

Reproduces reference ``src/train.py:53-130`` semantics with one documented
fix: the reference expands its latitude weights (and boundary mask) in
lon-major order (``src/train.py:71-72,74-82``) while its data pipeline
flattens nodes lat-major (``src/data/dataloader_chunked.py:213-221``) — a
layout mismatch that scrambles the weights on non-square grids.  Here both
are built in the data's actual lat-major order.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

__all__ = [
    "lat_weights_from_axis",
    "lat_weights_from_nodes",
    "boundary_mask",
    "channel_mask",
    "combine_spatial_masks",
    "weighted_mse",
    "spectral_loss",
    "gradient_loss",
    "anomaly_correlation",
]


def lat_weights_from_axis(num_lat: int, num_lon: int) -> np.ndarray:
    """cos-lat weights, normalized to mean 1, expanded lat-major -> [G].

    Uses linspace(-90, 90) over the latitude axis like the reference
    (src/train.py:65-66), laid out to match the lat-major node order.
    """
    lats = np.linspace(-90.0, 90.0, num_lat)
    w = np.cos(np.deg2rad(lats))
    w = w / w.mean()
    return np.repeat(w, num_lon).astype(np.float32)  # lat-major


def lat_weights_from_nodes(node_lats: np.ndarray) -> np.ndarray:
    """Per-node cos-lat weights for flat (multires) grids -> [G]."""
    w = np.cos(np.deg2rad(node_lats.astype(np.float64)))
    w = w / w.mean()
    return w.astype(np.float32)


def boundary_mask(num_lat: int, num_lon: int, width: int) -> np.ndarray:
    """[G] float mask, 0 inside a `width`-point frame at the region edges,
    1 in the interior.  Lat-major layout."""
    m = np.zeros((num_lat, num_lon), dtype=np.float32)
    if width <= 0:
        return np.ones(num_lat * num_lon, dtype=np.float32)
    m[width : num_lat - width, width : num_lon - width] = 1.0
    return m.reshape(-1)


def channel_mask(
    num_channels: int,
    static_channels: Sequence[int] = (),
    forcing_channels: Sequence[int] = (),
) -> Optional[np.ndarray]:
    """[C] float mask with 0 on static+forcing channels; None if all live."""
    excluded = sorted(set(static_channels) | set(forcing_channels))
    if not excluded:
        return None
    cm = np.ones(num_channels, dtype=np.float32)
    for ch in excluded:
        if 0 <= ch < num_channels:
            cm[ch] = 0.0
    return cm


def combine_spatial_masks(*masks: Optional[np.ndarray]) -> Optional[np.ndarray]:
    out = None
    for m in masks:
        if m is None:
            continue
        out = m if out is None else out * m
    return out


def weighted_mse(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    lat_weights: Optional[jnp.ndarray] = None,
    chan_mask: Optional[jnp.ndarray] = None,
    spatial_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Σ w·(p−t)² / Σ w with w = lat ⊗ spatial ⊗ channel (broadcast over any
    leading batch axes).  pred/target: [..., G, C]."""
    diff = jnp.square(pred - target)
    weights = jnp.ones_like(diff)
    if chan_mask is not None:
        weights = weights * chan_mask
    if spatial_mask is not None:
        weights = weights * spatial_mask[..., :, None]
    if lat_weights is not None:
        weights = weights * lat_weights[..., :, None]
    return (diff * weights).sum() / jnp.maximum(weights.sum(), 1e-12)


def spectral_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """L1 distance between 2-D FFT amplitude spectra.

    pred/target: [..., H, W, C].  Penalizes blurring (missing small-scale
    energy) that plain MSE ignores — used by the V2 U-Net and downscaler
    trainers (reference scripts/train_downscaler.py:196-204)."""
    pf = jnp.abs(jnp.fft.rfft2(pred, axes=(-3, -2), norm="ortho"))
    tf = jnp.abs(jnp.fft.rfft2(target, axes=(-3, -2), norm="ortho"))
    return jnp.mean(jnp.abs(pf - tf))


_SOBEL_X = jnp.asarray([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]])
_SOBEL_Y = _SOBEL_X.T


def gradient_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """L1 distance between Sobel spatial gradients (sharpness prior).

    pred/target: [..., H, W, C]."""
    import jax

    def sobel(x):
        b = x.reshape((-1,) + x.shape[-3:])          # [N, H, W, C]
        xc = jnp.moveaxis(b, -1, 1).reshape(-1, x.shape[-3], x.shape[-2], 1)
        kx = _SOBEL_X[:, :, None, None]
        ky = _SOBEL_Y[:, :, None, None]
        gx = jax.lax.conv_general_dilated(
            xc, kx, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        gy = jax.lax.conv_general_dilated(
            xc, ky, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return gx, gy

    pgx, pgy = sobel(pred)
    tgx, tgy = sobel(target)
    return jnp.mean(jnp.abs(pgx - tgx)) + jnp.mean(jnp.abs(pgy - tgy))


def anomaly_correlation(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    exclude_channels: Sequence[int] = (),
) -> jnp.ndarray:
    """Spatial anomaly correlation coefficient, per feature then averaged
    over live channels (and any leading batch axes).
    pred/target: [..., G, C].  ~ reference spatial_corr (src/train.py:114-130).
    """
    p = pred - pred.mean(axis=-2, keepdims=True)
    t = target - target.mean(axis=-2, keepdims=True)
    p = p / (pred.std(axis=-2, keepdims=True) + 1e-8)
    t = t / (target.std(axis=-2, keepdims=True) + 1e-8)
    acc_pf = (p * t).mean(axis=-2)  # [..., C]
    if exclude_channels:
        c = pred.shape[-1]
        keep = np.array(
            [i for i in range(c) if i not in set(exclude_channels)], np.int32
        )
        acc_pf = acc_pf[..., keep]
    return acc_pf.mean()
