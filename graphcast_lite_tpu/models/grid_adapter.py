"""Adapter: image (H, W) models speak the flat-node model interface.

The training/rollout/inference stack operates on node-flattened state
[G, obs·C] with G = n_lat·n_lon in lat-major order.  ``GridImageModel``
wraps any NHWC image module (the U-Net family) with that interface, so the
same Trainer, AR rollout, evaluation engine, DA hooks and post-processing
serve both the GNN and CNN stacks — the reference maintains a parallel
trainer/predictor pair for its U-Nets (``src/unet/main*.py``,
``src/unet/predict*.py``); here they share one engine.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["GridImageModel"]


class GridImageModel(nn.Module):
    """Wraps an image module to the WeatherModel call convention.

    __call__(x [G, obs·C], graphs, edge_mask, thr, prune) -> (delta [G, C],
    edge_mask) — graphs/masks are ignored (CNNs need no graph)."""

    image_module: nn.Module
    n_lat: int
    n_lon: int

    @property
    def num_grid_nodes(self) -> int:
        return self.n_lat * self.n_lon

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        graphs=None,
        edge_mask: Optional[jnp.ndarray] = None,
        attention_threshold: float = 0.0,
        prune: bool = False,
    ):
        img = x.reshape(self.n_lat, self.n_lon, x.shape[-1])[None]
        out = self.image_module(img)
        return out[0].reshape(self.num_grid_nodes, out.shape[-1]), edge_mask
