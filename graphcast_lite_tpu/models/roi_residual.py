"""ROI-residual regional corrector.

~ reference ``src/roi_residual.py``: a simpler regional head than the
dual-mesh — a k-NN graph over the ROI *grid* points themselves, input
[raw obs ‖ global encoder grid latent ‖ global prediction], an unshared
InteractionNet processor (6 steps), and a near-zero-init MLP head whose
output corrects the frozen global prediction on the ROI:

  output = global_pred + scatter(correction, roi_idx)

Same functional composition pattern as the dual-mesh module: the global
model runs outside under ``stop_gradient``; this module is purely the
trainable corrector.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from ..graphs.structure import Graph
from .gnn import InteractionNetProcessor
from .dual_mesh import _SmallInitLinear
from .nn import TorchLinear

__all__ = ["ROIResidualHead", "ROIResidualModule", "roi_residual_forward"]


class ROIResidualHead(nn.Module):
    """Linear→SiLU→Linear→SiLU→SmallInitLinear on [state ‖ skip]."""

    hidden_dim: int
    output_dim: int

    @nn.compact
    def __call__(self, node_state, skip_features):
        x = jnp.concatenate([node_state, skip_features], axis=-1)
        x = TorchLinear(self.hidden_dim, name="lin_0")(x)
        x = nn.silu(x)
        x = TorchLinear(self.hidden_dim, name="lin_1")(x)
        x = nn.silu(x)
        return _SmallInitLinear(self.output_dim, name="out")(x)


class ROIResidualModule(nn.Module):
    """Trainable ROI corrector: input-proj MLP → InteractionNet over the ROI
    k-NN graph → residual head.  Returns [n_roi, C]."""

    hidden_dim: int = 256
    output_channels: int = 19
    processor_steps: int = 6

    @nn.compact
    def __call__(
        self,
        roi_raw: jnp.ndarray,           # [n_roi, T·F]
        roi_global_latent: jnp.ndarray, # [n_roi, D]
        roi_global_pred: jnp.ndarray,   # [n_roi, C]
        roi_graph: Graph,
    ) -> jnp.ndarray:
        skip = jnp.concatenate(
            [roi_raw, roi_global_latent, roi_global_pred], axis=-1
        )
        x = TorchLinear(self.hidden_dim, name="proj_0")(skip)
        x = nn.silu(x)
        x = TorchLinear(self.hidden_dim, name="proj_1")(x)
        x = InteractionNetProcessor(
            node_dim=self.hidden_dim,
            raw_edge_dim=4,
            edge_latent_dim=self.hidden_dim,
            hidden_dim=self.hidden_dim,
            num_steps=self.processor_steps,
            activation="swish",
            use_layer_norm=True,
            name="processor",
        )(x, roi_graph)
        return ROIResidualHead(
            self.hidden_dim, self.output_channels, name="head"
        )(x, skip)


def roi_residual_forward(
    global_apply,
    regional_apply,
    x_grid: jnp.ndarray,     # [G, T·F]
    roi_idx: jnp.ndarray,
    roi_graph: Graph,
) -> jnp.ndarray:
    """Frozen global + ROI correction composition.

    global_apply(x) -> (pred [G, C], grid_latent [G, D], _).
    regional_apply(roi_raw, roi_latent, roi_pred, graph) -> [n_roi, C].
    """
    pred, grid_latent, _ = global_apply(x_grid)
    pred = jax.lax.stop_gradient(pred)
    grid_latent = jax.lax.stop_gradient(grid_latent)
    roi_raw = jnp.take(x_grid, roi_idx, axis=0)
    roi_latent = jnp.take(grid_latent, roi_idx, axis=0)
    roi_pred = jnp.take(pred, roi_idx, axis=0)
    correction = regional_apply(roi_raw, roi_latent, roi_pred, roi_graph)
    return pred.at[roi_idx].add(correction)
