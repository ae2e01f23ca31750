"""Dual-mesh regional refinement model.

~ reference ``src/dual_mesh.py``: a frozen pretrained global model provides
the base forecast plus latents; a trainable regional module over a refined
icosahedral mesh (level 7/8 minus the global prefix) predicts a correction
added to the ROI grid points:

  output = global_pred + scatter(correction, roi_idx)

Functional JAX decomposition: the *regional module* here never contains the
global model.  A composition wrapper runs the global model's
``forward_with_latents`` under ``stop_gradient`` and feeds
(global_pred, grid_latent, processed_mesh_latent) into
``DualMeshRegional``.  This collapses the reference's two code paths
(``forward`` and the cached ``precompute_global``/``forward_cached``,
:729-805) into one: "cached training" is simply calling the regional module
on precomputed latents.

Sub-modules (reference line refs):
  * RegionalEncoder (:401-426): MLP on [raw ROI features ‖ global grid
    latent], scatter-mean onto the regional mesh.
  * CrossMessageLayer (:302-359): one global→regional message from the
    PROCESSED global mesh latents + residual + node LayerNorm.
  * RegionalProcessor (:364-396): shared-weight InteractionNetLayer × steps.
  * RegionalDecoder (:429-474): IDW-weighted scatter-sum + raw-feature skip
    connection, output head with small-scale (σ=0.01) init.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct

from ..graphs.structure import Graph
from ..graphs.regional import RegionalGraphs
from ..ops import segment as seg_ops
from .gnn import InteractionNetLayer
from .nn import PReLU, PyGLayerNorm, TorchLinear, resolve_activation

__all__ = ["RegionalDeviceGraphs", "DualMeshRegional", "dual_mesh_forward"]


@struct.dataclass
class RegionalDeviceGraphs:
    """Device-side pytree of the regional graph bundle."""

    processing: Graph
    cross_g2r: Graph
    encoding: Graph
    decoding: Graph
    dec_idw: jnp.ndarray
    roi_idx: jnp.ndarray
    n_reg_mesh: int = struct.field(pytree_node=False, default=0)
    n_roi: int = struct.field(pytree_node=False, default=0)
    num_grid_nodes: int = struct.field(pytree_node=False, default=0)

    @classmethod
    def from_host(cls, rg: RegionalGraphs, num_grid_nodes: int):
        return cls(
            processing=rg.processing,
            cross_g2r=rg.cross_g2r,
            encoding=rg.encoding,
            decoding=rg.decoding,
            dec_idw=jnp.asarray(rg.dec_idw),
            roi_idx=jnp.asarray(rg.roi_idx),
            n_reg_mesh=rg.n_reg_mesh,
            n_roi=rg.n_roi,
            num_grid_nodes=num_grid_nodes,
        )


class _SiluMLP(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = TorchLinear(self.hidden, name="lin_0")(x)
        x = nn.silu(x)
        return TorchLinear(self.out, name="lin_1")(x)


class _SmallInitLinear(nn.Module):
    """Linear with N(0, 0.01) kernel and zero bias (near-zero correction at
    init, but non-zero so gradients reach upstream modules)."""

    features: int

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            lambda key, shape: 0.01 * jax.random.normal(key, shape),
            (x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x @ kernel + bias


class CrossMessageLayer(nn.Module):
    """Global→regional message + residual + node LayerNorm."""

    node_dim: int
    hidden_dim: int
    activation: str = "swish"

    @nn.compact
    def __call__(
        self,
        h_global: jnp.ndarray,     # [N_glob, D_g]
        h_regional: jnp.ndarray,   # [N_reg, D]
        cross: Graph,              # global -> regional
        cross_edge_attr: jnp.ndarray,  # [E_pad, edge_dim] (pre-encoded)
    ) -> jnp.ndarray:
        sender = jnp.take(h_global, cross.senders, axis=0)
        receiver = jnp.take(h_regional, cross.receivers, axis=0)
        inp = jnp.concatenate([sender, receiver, cross_edge_attr], axis=-1)
        msg = _SiluMLP(self.hidden_dim, self.node_dim, name="g2r_edge_mlp")(inp)
        agg = seg_ops.aggregate_mean(msg, cross)
        return PyGLayerNorm(mode="node", name="norm_reg")(h_regional + agg)


class RegionalProcessor(nn.Module):
    """Shared-weight InteractionNetLayer applied `num_steps` times."""

    node_dim: int
    hidden_dim: int
    num_steps: int = 4
    raw_edge_dim: int = 4
    activation: str = "swish"

    @nn.compact
    def __call__(self, x: jnp.ndarray, graph: Graph) -> jnp.ndarray:
        e = TorchLinear(self.node_dim, name="edge_encoder_lin")(graph.edge_attr)
        act = resolve_activation(self.activation)
        e = PReLU(name="edge_encoder_act")(e) if act is None else act(e)
        step = InteractionNetLayer(
            node_dim=self.node_dim,
            edge_dim=self.node_dim,
            hidden_dim=self.hidden_dim,
            activation=self.activation,
            use_layer_norm=True,
            name="step",
        )
        for _ in range(self.num_steps):
            x, e = step(x, e, graph)
        return x


class DualMeshRegional(nn.Module):
    """The trainable regional correction module.

    Takes ROI raw features + global latents; returns the ROI correction
    [n_roi, C_out].
    """

    hidden_dim: int = 256
    output_channels: int = 19
    processor_steps: int = 4

    @nn.compact
    def __call__(
        self,
        roi_raw: jnp.ndarray,          # [n_roi, T·F]
        roi_grid_latent: jnp.ndarray,  # [n_roi, D_g] global encoder latents
        global_mesh_latent: jnp.ndarray,  # [N_glob_mesh, D_g] processed
        graphs: RegionalDeviceGraphs,
    ) -> jnp.ndarray:
        roi_input = jnp.concatenate([roi_raw, roi_grid_latent], axis=-1)

        # Encoder: MLP then scatter-mean grid -> regional mesh.
        x = _SiluMLP(self.hidden_dim, self.hidden_dim, name="reg_encoder")(
            roi_input
        )
        msg = jnp.take(x, graphs.encoding.senders, axis=0)
        mesh_feat = seg_ops.aggregate_mean(msg, graphs.encoding)

        # Cross message from the processed global mesh latents.
        cross_attr = TorchLinear(self.hidden_dim, name="cross_edge_lin")(
            graphs.cross_g2r.edge_attr
        )
        cross_attr = nn.silu(cross_attr)
        mesh_feat = CrossMessageLayer(
            node_dim=self.hidden_dim, hidden_dim=self.hidden_dim,
            name="cross_message",
        )(global_mesh_latent, mesh_feat, graphs.cross_g2r, cross_attr)

        # Regional processing (shared weights).
        mesh_feat = RegionalProcessor(
            node_dim=self.hidden_dim, hidden_dim=self.hidden_dim,
            num_steps=self.processor_steps, name="reg_processor",
        )(mesh_feat, graphs.processing)

        # Decoder: IDW-weighted scatter-sum + skip connection + small head.
        mesh_msg = jnp.take(mesh_feat, graphs.decoding.senders, axis=0)
        mesh_msg = mesh_msg * graphs.dec_idw[:, None]
        grid_agg = seg_ops.aggregate_sum(mesh_msg, graphs.decoding)
        dec_in = jnp.concatenate([grid_agg, roi_input], axis=-1)
        h = TorchLinear(self.hidden_dim, name="dec_lin0")(dec_in)
        h = nn.silu(h)
        return _SmallInitLinear(self.output_channels, name="dec_out")(h)


def dual_mesh_forward(
    global_apply,
    regional_apply,
    x_grid: jnp.ndarray,           # [G, T·F]
    graphs: RegionalDeviceGraphs,
) -> jnp.ndarray:
    """Compose frozen global model + regional correction.

    global_apply(x_grid) -> (pred [G, C], grid_latent [G, D],
                             processed_mesh_latent [M, D]); gradients are
    stopped through all three (the reference freezes the global model).
    regional_apply(roi_raw, roi_latent, mesh_latent) -> [n_roi, C].
    """
    pred, grid_latent, mesh_latent = global_apply(x_grid)
    pred = jax.lax.stop_gradient(pred)
    grid_latent = jax.lax.stop_gradient(grid_latent)
    mesh_latent = jax.lax.stop_gradient(mesh_latent)

    roi_raw = jnp.take(x_grid, graphs.roi_idx, axis=0)
    roi_latent = jnp.take(grid_latent, graphs.roi_idx, axis=0)
    correction = regional_apply(roi_raw, roi_latent, mesh_latent)
    return pred.at[graphs.roi_idx].add(correction)
