"""The flagship encode-process-decode weather model.

Functional JAX re-design of the reference's ``WeatherPrediction``
(reference src/models.py:476-927):

* graphs and static features are built once on the host
  (``graphs.build.build_graph_set``) and passed in as a ``ModelGraphs``
  pytree of device arrays — the model itself is a pure function of
  (params, inputs, graphs, edge-mask state);
* the SparseGAT edge-pruning side effect (reference mutates
  ``self.processing_graph`` in place) becomes an explicit
  ``processing_edge_mask`` carried through the call and returned updated;
* everything traces with static shapes (padded edge lists, masks), so the
  whole AR rollout jits into one XLA program.

Call convention (single sample; batch via ``jax.vmap`` with graphs held
constant):

    out, new_mask = model.apply(params, x_grid, graphs, mask,
                                attention_threshold=…, prune=…)

where ``x_grid`` is [G, obs·F] (or [G, F] after the product-graph stage).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct

from ..config import (
    DataConfig,
    GraphBlock,
    GraphLayerType,
    ModelConfig,
    PipelineConfig,
)
from ..graphs.structure import Graph, build_graph
from ..graphs.build import GraphSet
from ..graphs.product import build_product_graph_edges
from .gnn import (
    GATConv,
    GCNConv,
    InteractionNetProcessor,
    SimpleConv,
    SparseGATConv,
)
from .nn import MLPTower, PReLU, PyGLayerNorm, resolve_activation

__all__ = ["ModelGraphs", "WeatherModel", "graph_layer_output_dim", "model_output_dim"]


@struct.dataclass
class ModelGraphs:
    """Device-side static graph bundle consumed by the jitted model."""

    encoding: Graph
    processing: Graph
    decoding: Graph
    grid_static: jnp.ndarray   # [N, 6]
    mesh_static: jnp.ndarray   # [M, 6]
    product: Optional[Graph] = None
    num_grid_nodes: int = struct.field(pytree_node=False, default=0)
    num_mesh_nodes: int = struct.field(pytree_node=False, default=0)

    @classmethod
    def from_graph_set(
        cls,
        gs: GraphSet,
        product_config=None,
        obs_window: int = 1,
    ) -> "ModelGraphs":
        product = None
        if product_config is not None:
            ps, pr = build_product_graph_edges(
                np.unique(gs.grid_lat) if gs.grid_lat.ndim == 1 else gs.grid_lat,
                np.unique(gs.grid_lon),
                obs_window,
                product_config.num_k,
                product_config.type,
            )
            product = build_graph(
                ps, pr, num_nodes=gs.num_grid_nodes * obs_window, build_ell=False
            )
        return cls(
            encoding=gs.encoding,
            processing=gs.processing,
            decoding=gs.decoding,
            grid_static=jnp.asarray(gs.grid_static),
            mesh_static=jnp.asarray(gs.mesh_static),
            product=product,
            num_grid_nodes=gs.num_grid_nodes,
            num_mesh_nodes=gs.num_mesh_nodes,
        )


def _encdec_remat() -> bool:
    """Trace-time policy: remat the encoder/decoder blocks.  ON by default:
    it funds the ~1.5 GB that saving the fused edge unit's h_pre residual
    costs (the faster-backward default, ops/fused_edge.py), and the combo
    measures faster end-to-end (1516 vs 1555 ms/512x256 train step) because
    the enc/dec recompute is cheaper than the h_pre recompute it displaces.
    GCLT_ENCDEC_REMAT=0 turns it off (pair with GCLT_FUSED_SAVE_HPRE=0)."""
    import os

    v = os.environ.get("GCLT_ENCDEC_REMAT")
    if v is not None:
        return v not in ("0", "false", "off")
    return True


def graph_layer_output_dim(cfg: GraphBlock, input_dim: int) -> int:
    """Output dim bookkeeping, mirroring reference GraphLayer (:289-404)."""
    if cfg.layer_type == GraphLayerType.SimpleConv:
        return input_dim
    return int(cfg.output_dim)


def model_output_dim(cfg: ModelConfig, input_dim: int) -> int:
    gl_in = cfg.mlp.output_dim if cfg.mlp is not None else input_dim
    return graph_layer_output_dim(cfg.gcn, gl_in)


class GraphLayerModule(nn.Module):
    """Dispatcher over graph-layer types (reference GraphLayer, :289-440).

    Uniform signature: (x, graph, edge_mask, attention_threshold, prune)
    -> (x, edge_mask').  Only SparseGAT ever changes the mask.
    """

    cfg: GraphBlock
    input_dim: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        graph: Graph,
        edge_mask: Optional[jnp.ndarray] = None,
        attention_threshold: float = 0.0,
        prune: bool = False,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        cfg = self.cfg
        lt = cfg.layer_type

        if lt == GraphLayerType.SimpleConv:
            return SimpleConv(name="conv")(x, graph, edge_mask), edge_mask

        if lt in (GraphLayerType.ConvGCN, GraphLayerType.GATConv):
            hidden = list(cfg.hidden_dims or [])
            dims = hidden + [int(cfg.output_dim)]
            act_fn = resolve_activation(cfg.activation)
            shared_prelu = (
                PReLU(name="act") if act_fn is None else None
            )  # reference shares ONE activation module across the stack

            def act(v):
                return shared_prelu(v) if act_fn is None else act_fn(v)

            for i, d in enumerate(dims):
                if lt == GraphLayerType.ConvGCN:
                    x = GCNConv(d, name=f"conv_{i}")(x, graph, edge_mask)
                else:
                    x = GATConv(
                        d, heads=cfg.gat_props.num_heads, name=f"conv_{i}"
                    )(x, graph, edge_mask)
                if i < len(dims) - 1:
                    x = act(x)
            if cfg.use_layer_norm:
                x = PyGLayerNorm(
                    mode=cfg.layer_norm_mode or "node", name="norm"
                )(x)
            return x, edge_mask

        if lt == GraphLayerType.SparseGATConv:
            x, new_mask = SparseGATConv(
                int(cfg.output_dim),
                heads=cfg.gat_props.num_heads,
                name="conv_0",
            )(x, graph, edge_mask, attention_threshold, prune)
            if cfg.use_layer_norm:
                x = PyGLayerNorm(
                    mode=cfg.layer_norm_mode or "node", name="norm"
                )(x)
            return x, new_mask

        if lt == GraphLayerType.InteractionNet:
            assert int(cfg.output_dim) == self.input_dim, (
                "InteractionNet requires output_dim == input_dim (residuals)"
            )
            num_steps = cfg.num_message_passing_steps or 4
            raw_edge_dim = cfg.edge_feature_dim or 4
            use_ln = cfg.use_layer_norm if cfg.use_layer_norm is not None else True
            x = InteractionNetProcessor(
                node_dim=self.input_dim,
                raw_edge_dim=raw_edge_dim,
                edge_latent_dim=self.input_dim,
                hidden_dim=self.input_dim,
                num_steps=num_steps,
                activation=cfg.activation or "swish",
                use_layer_norm=use_ln,
                name="inet",
            )(x, graph, edge_mask=edge_mask)
            return x, edge_mask

        raise NotImplementedError(f"Layer type {lt} not supported.")


class ModelBlock(nn.Module):
    """(optional MLP) -> GraphLayer (reference Model, src/models.py:443-473)."""

    cfg: ModelConfig
    input_dim: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        graph: Graph,
        edge_mask: Optional[jnp.ndarray] = None,
        attention_threshold: float = 0.0,
        prune: bool = False,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        gl_in = self.input_dim
        if self.cfg.mlp is not None:
            x = MLPTower(
                hidden_dims=self.cfg.mlp.mlp_hidden_dims,
                output_dim=self.cfg.mlp.output_dim,
                use_layer_norm=self.cfg.mlp.use_layer_norm,
                layer_norm_mode=self.cfg.mlp.layer_norm_mode,
                name="mlp",
            )(x)
            gl_in = self.cfg.mlp.output_dim
        return GraphLayerModule(self.cfg.gcn, gl_in, name="graph_layer")(
            x, graph, edge_mask, attention_threshold, prune
        )


class WeatherModel(nn.Module):
    """Encode-process-decode over grid + icosahedral multi-mesh.

    Single-sample functional forward; returns (grid_prediction [N, C_out],
    updated processing-edge mask).  ``forward_with_latents`` additionally
    exposes encoder grid latents + processed mesh latents for the regional
    stacks (dual-mesh / ROI heads), mirroring reference
    ``forward_with_latents`` (src/models.py:876-927).
    """

    pipeline: PipelineConfig
    data: DataConfig
    num_grid_nodes: int
    num_mesh_nodes: int

    def _encoder_input_dim(self) -> int:
        static = 6
        if self.pipeline.product_graph is not None:
            return self.data.num_features_used + static
        return self.data.num_features_used * self.data.obs_window_used + static

    @nn.compact
    def __call__(
        self,
        x_grid: jnp.ndarray,
        graphs: ModelGraphs,
        processing_edge_mask: Optional[jnp.ndarray] = None,
        attention_threshold: float = 0.0,
        prune: bool = False,
        with_latents: bool = False,
    ):
        n_grid = self.num_grid_nodes
        obs = self.data.obs_window_used
        feats = self.data.num_features_used

        # 1) Optional product-graph temporal pre-encoder: time-major reshape,
        #    small GNN over the (T x N)-node product graph, keep the last
        #    time slice.
        if self.pipeline.product_graph is not None:
            xt = x_grid.reshape(n_grid, obs, feats)          # [G, T, F]
            xt = jnp.swapaxes(xt, 0, 1).reshape(obs * n_grid, feats)
            xt, _ = ModelBlock(
                self.pipeline.product_graph.model, feats, name="product_model"
            )(xt, graphs.product)
            x_grid = xt[-n_grid:, :]

        # 2) Static features; zero dynamic state for mesh nodes; concat.
        grid_in = jnp.concatenate([x_grid, graphs.grid_static], axis=-1)
        mesh_dyn = jnp.zeros(
            (self.num_mesh_nodes, x_grid.shape[-1]), x_grid.dtype
        )
        mesh_in = jnp.concatenate([mesh_dyn, graphs.mesh_static], axis=-1)
        x = jnp.concatenate([grid_in, mesh_in], axis=0)      # [(N+M), C]

        # 3) Encoder over Grid->Mesh.  When the processor scan runs WITHOUT
        # inner remat (GCLT_SCAN_REMAT=none, the fast-backward default), the
        # encoder/decoder blocks are rematerialized instead: their [N, 2h]
        # MLP temps (~170 MB each at 512x256) are what overflows HBM, and
        # they are cheap to recompute (~33 ms/AR step vs the processor's
        # ~240 ms).  GCLT_ENCDEC_REMAT=0/1 overrides.
        # prevent_cse must stay True (default): these blocks are inline in
        # the AR python loop, and with CSE enabled XLA merges the backward's
        # recompute with the forward — silently re-saving the activations
        # this remat exists to drop (verified: with prevent_cse=False the
        # compile still OOMs with the same decoder temps live).
        Block = nn.remat(ModelBlock) if _encdec_remat() else ModelBlock
        enc_in_dim = self._encoder_input_dim()
        x, _ = Block(self.pipeline.encoder, enc_in_dim, name="encoder")(
            x, graphs.encoding
        )
        grid_latent = x[:n_grid]
        mesh_latent = x[n_grid:]

        # 4) Processor over the multimesh (mesh-local node space).
        proc_in_dim = model_output_dim(self.pipeline.encoder, enc_in_dim)
        mesh_processed, new_mask = ModelBlock(
            self.pipeline.processor, proc_in_dim, name="processor"
        )(
            mesh_latent,
            graphs.processing,
            processing_edge_mask,
            attention_threshold,
            prune,
        )

        # 5) Decoder over Mesh->Grid on the combined array; keep grid rows.
        dec_in_dim = model_output_dim(self.pipeline.processor, proc_in_dim)
        combined = jnp.concatenate([grid_latent, mesh_processed], axis=0)
        decoded, _ = Block(self.pipeline.decoder, dec_in_dim, name="decoder")(
            combined, graphs.decoding
        )
        out = decoded[:n_grid]

        if with_latents:
            return out, new_mask, grid_latent, mesh_processed
        return out, new_mask
