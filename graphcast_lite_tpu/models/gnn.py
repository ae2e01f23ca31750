"""Graph neural-network layers on static padded graphs.

Each layer reproduces the numerics of its PyG counterpart used by the
reference (reference src/models.py), re-formulated scatter-free for TPU:

* ``GCNConv``  ~ PyG GCNConv: symmetric normalization with implicit self
  loops.  Self loops are handled *analytically* (a per-node term added after
  aggregation) instead of materializing N extra edges — same math, static
  shapes, no edge-list concat.
* ``GATConv``  ~ PyG GATConv(concat=False): per-head additive attention with
  LeakyReLU(0.2), softmax over incoming edges *including* the implicit self
  loop, head averaging, then bias.
* ``SparseGATConv`` ~ reference SparseGATConv (src/models.py:112-151): a GAT
  layer that can also emit a pruned edge mask (α ≥ threshold).  Where the
  reference reallocates ``edge_index``, this implementation updates a
  float mask over the fixed edge superset — the TPU-native formulation of
  dynamic sparsity (masked edges contribute nothing to softmax denominators
  or degrees).  Self loops are implicit and hence never pruned, matching the
  reference's effective behavior (GATConv re-adds self loops each call).
* ``SimpleConv`` ~ PyG SimpleConv(aggr="mean"): mean of neighbors, no
  weights, no self loops (isolated receivers get 0).
* ``InteractionNetLayer`` / ``InteractionNetProcessor`` ~ reference
  src/models.py:166-285: GraphCast-style edge+node updates with residuals,
  scatter-mean aggregation, and PyG LayerNorm (edge: graph mode, node: node
  mode).  Aggregation uses the ELL (dense-gather) path when available.

All layers take an optional ``edge_mask`` [E_pad] overriding the graph's
static mask (this is how SparseGAT pruning is threaded through time).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..graphs.structure import Graph
from ..ops import ell as ell_ops
from ..ops import segment as seg_ops
from .nn import (
    PReLU,
    PyGLayerNorm,
    TorchLinear,
    glorot_uniform_pyg,
    resolve_activation,
)

__all__ = [
    "GCNConv",
    "GATConv",
    "SparseGATConv",
    "SimpleConv",
    "InteractionNetLayer",
    "InteractionNetProcessor",
]


def _edge_mask(graph: Graph, override: Optional[jnp.ndarray]) -> jnp.ndarray:
    return graph.edge_mask if override is None else override


class GCNConv(nn.Module):
    """PyG-parity GCN convolution with implicit self loops.

    out = D^{-1/2} (A + I) D^{-1/2} X W + b, where D is the in-degree
    (+1 for the self loop) computed over the *receiver* side, and a sender's
    normalizer looks up the same degree array (PyG gcn_norm semantics).
    """

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        graph: Graph,
        edge_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        assert graph.num_receivers == graph.num_nodes, (
            "GCNConv expects the unified node-space convention"
        )
        mask = _edge_mask(graph, edge_mask)
        kernel = self.param(
            "kernel", glorot_uniform_pyg, (x.shape[-1], self.features)
        )
        xw = x @ kernel

        if edge_mask is None and graph.gcn_norm is not None:
            # Mask-static graph: both the symmetric edge normalizer and the
            # self-loop degree are host precomputes (structure.build_graph)
            # — no runtime degree reduction or dinv gathers.
            deg = graph.static_in_degree + 1.0
            norm = graph.gcn_norm
        else:
            deg = seg_ops.masked_in_degree(graph, mask) + 1.0  # + self loop
            dinv = jax.lax.rsqrt(deg)
            norm = jnp.take(dinv, graph.senders) * jnp.take(
                dinv, graph.receivers
            )
        from ..ops.gcn_agg import gcn_aggregate, supports_gcn_aggregate

        if supports_gcn_aggregate(graph, self.features):
            # Custom-VJP unit: fwd Pallas segment, bwd transpose-ELL dense
            # gather (or sender-sorted Pallas) — replaces the unsorted XLA
            # scatter adjoint that dominated the encoder/decoder backward.
            agg = gcn_aggregate(xw, norm * mask.astype(norm.dtype), graph)
        elif graph.has_ell:
            agg = ell_ops.aggregate_sum_ell(xw, graph, mask, edge_scale=norm)
        else:
            from ..ops.gather import gather_rows

            agg = seg_ops.aggregate_sum(
                gather_rows(xw, graph.senders_aux, graph.senders)
                * norm[:, None],
                graph, mask,
            )
        # Implicit self loop: norm_ii = 1/deg_i.
        out = agg + xw / deg[:, None]
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias
        return out


class _GATCore(nn.Module):
    """Shared math for GATConv / SparseGATConv.  Returns (out, alpha)."""

    features: int
    heads: int = 1
    negative_slope: float = 0.2
    use_bias: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        graph: Graph,
        edge_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mask = _edge_mask(graph, edge_mask)
        h, c = self.heads, self.features
        kernel = self.param("kernel", glorot_uniform_pyg, (x.shape[-1], h * c))
        att_src = self.param("att_src", glorot_uniform_pyg, (1, h, c))
        att_dst = self.param("att_dst", glorot_uniform_pyg, (1, h, c))

        xp = (x @ kernel).reshape(-1, h, c)  # [N, H, C]
        a_src = (xp * att_src).sum(-1)  # [N, H]
        a_dst = (xp * att_dst).sum(-1)

        logits = jnp.take(a_src, graph.senders, axis=0) + jnp.take(
            a_dst, graph.receivers, axis=0
        )  # [E_pad, H]
        logits = nn.leaky_relu(logits, self.negative_slope)
        # Implicit self loop for every receiver row.
        assert graph.num_receivers == graph.num_nodes, (
            "GATConv expects the unified node-space convention"
        )
        self_logits = nn.leaky_relu(a_src + a_dst, self.negative_slope)

        if graph.has_ell:
            w, self_w = ell_ops.softmax_ell(logits, graph, mask, self_logits)
            # w: [R, K, H]; neighbor features [R, K, H, C]
            r, k = graph.neigh_senders.shape
            neigh = jnp.take(
                xp, graph.neigh_senders.reshape(-1), axis=0
            ).reshape(r, k, h, c)
            out = jnp.einsum("rkhc,rkh->rhc", neigh, w)
        else:
            w, self_w = seg_ops.segment_softmax_coo(logits, graph, mask, self_logits)
            msgs = jnp.take(xp, graph.senders, axis=0) * w[..., None]
            out = jax.ops.segment_sum(
                msgs * mask[:, None, None],
                graph.receivers,
                num_segments=graph.num_receivers,
                indices_are_sorted=True,
            )
        out = out + xp * self_w[..., None]
        out = out.mean(axis=1)  # concat=False -> head average
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (c,))
            out = out + bias
        # α per edge (mean over heads), zero on masked edges — used by SparseGAT.
        if graph.has_ell:
            # Recover per-COO-edge α from the slot weights.
            alpha_coo = jnp.zeros((graph.senders.shape[0],), out.dtype)
            flat_edges = graph.neigh_edge.reshape(-1)
            flat_alpha = w.mean(axis=-1).reshape(-1) * graph.neigh_mask.reshape(-1)
            alpha_coo = alpha_coo.at[flat_edges].add(flat_alpha)
        else:
            alpha_coo = w.mean(axis=-1) * mask
        return out, alpha_coo


class GATConv(nn.Module):
    """PyG GATConv(concat=False) parity layer."""

    features: int
    heads: int = 1

    @nn.compact
    def __call__(self, x, graph: Graph, edge_mask=None):
        out, _ = _GATCore(self.features, self.heads, name="core")(
            x, graph, edge_mask
        )
        return out


class SparseGATConv(nn.Module):
    """GAT that can emit a pruned edge mask (reference SparseGATConv).

    When ``prune`` is True, edges with mean-head attention below
    ``attention_threshold`` are dropped from the returned mask (the caller
    carries the mask to subsequent steps/epochs — the functional analogue of
    the reference's in-place ``self.processing_graph`` mutation).
    """

    features: int
    heads: int = 1

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        graph: Graph,
        edge_mask: Optional[jnp.ndarray] = None,
        attention_threshold: float = 0.0,
        prune: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mask = _edge_mask(graph, edge_mask)
        out, alpha = _GATCore(self.features, self.heads, name="core")(
            x, graph, mask
        )
        if prune:
            new_mask = mask * (alpha >= attention_threshold).astype(mask.dtype)
        else:
            new_mask = mask
        return out, new_mask


class SimpleConv(nn.Module):
    """PyG SimpleConv(aggr='mean'): unweighted neighbor mean, no self loops."""

    @nn.compact
    def __call__(self, x, graph: Graph, edge_mask=None):
        mask = _edge_mask(graph, edge_mask)
        if graph.has_ell:
            out = ell_ops.aggregate_mean_ell(x, graph, mask)
        else:
            out = seg_ops.aggregate_mean(
                jnp.take(x, graph.senders, axis=0), graph, mask
            )
        return out


class _TwoLayerMLP(nn.Module):
    """Linear -> act -> Linear, with an optionally shared PReLU module."""

    hidden: int
    out: int
    activation: str = "swish"

    @nn.compact
    def __call__(self, x):
        x = TorchLinear(self.hidden, name="lin_0")(x)
        act = resolve_activation(self.activation)
        if act is None:
            x = PReLU(name="act")(x)
        else:
            x = act(x)
        return TorchLinear(self.out, name="lin_1")(x)


# (the former _ParamLinear duplicate was unified into _TorchLinearParams —
# their init expressions were bit-identical; tests/test_gnn_parity.py::
# test_params_only_linear_matches_torch_linear pins that.)


class _SplitEdgeMLP(nn.Module):
    """The InteractionNet edge MLP with the first matmul split by input
    blocks:  W1 @ [h_s ‖ h_r ‖ e]  ==  W1s h_s + W1r h_r + W1e e.

    Identical math and identical parameter layout to _TwoLayerMLP over the
    concatenated input, but the sender/receiver projections run in NODE
    space (N rows) before the edge gathers instead of in EDGE space
    (E ≈ 6N rows): ~55% fewer first-layer FLOPs and no [E, 3D] concat
    materialization — the dominant HBM traffic of the processor loop.
    """

    node_dim: int
    edge_dim: int
    hidden: int
    out: int
    activation: str = "swish"

    @nn.compact
    def __call__(self, x, edge_attr, graph: Graph):
        from ..ops.gather import gather_rows

        d, de = self.node_dim, self.edge_dim
        lin_0 = _TorchLinearParams(2 * d + de, self.hidden, name="lin_0")
        k = lin_0.kernel
        xs = x @ k[:d]
        xr = x @ k[d : 2 * d]
        ep = edge_attr @ k[2 * d :]
        h = (
            gather_rows(xs, graph.senders_aux, graph.senders)
            + gather_rows(xr, graph.receivers_aux, graph.receivers)
            + ep
            + lin_0.bias
        )
        act = resolve_activation(self.activation)
        h = PReLU(name="act")(h) if act is None else act(h)
        return TorchLinear(self.out, name="lin_1")(h)


class _TorchLinearParams(nn.Module):
    """Declares TorchLinear's params without applying them — the single
    canonical params-only declarator for callers that restructure the
    matmul (split/fused edge MLPs).  The init expressions are bit-identical
    to ``TorchLinear``'s (u·2b−b with b = 1/sqrt(fan_in)), so plain, split
    and fused paths provably share checkpoints."""

    in_features: int
    out_features: int

    def setup(self):
        from .nn import torch_linear_init

        bound = 1.0 / np.sqrt(self.in_features) if self.in_features else 0.0
        self.kernel = self.param(
            "kernel", torch_linear_init(), (self.in_features, self.out_features)
        )

        def bias_init(key, shape, dtype=jnp.float32):
            return nn.initializers.uniform(scale=2 * bound)(
                key, shape, dtype
            ) - bound

        self.bias = self.param("bias", bias_init, (self.out_features,))

    def __call__(self, x):  # pragma: no cover - not used directly
        return x @ self.kernel + self.bias


class _FusedEdgeMLP(nn.Module):
    """Same parameters/namespace as ``_SplitEdgeMLP`` (lin_0 / lin_1 under
    "edge_mlp"), but the whole edge pipeline INCLUDING the mean aggregation
    runs through ``ops.fused_edge.edge_pipeline`` — one custom-VJP unit whose
    backward routes every scatter through the Pallas segment kernel.
    Returns (edge_update, agg_mean)."""

    node_dim: int
    edge_dim: int
    hidden: int
    out: int
    activation: str = "swish"

    @nn.compact
    def __call__(self, x, edge_attr, graph: Graph, mask):
        from ..ops.fused_edge import edge_pipeline

        d, de = self.node_dim, self.edge_dim
        lin_0 = _TorchLinearParams(2 * d + de, self.hidden, name="lin_0")
        lin_1 = _TorchLinearParams(self.hidden, self.out, name="lin_1")
        k = lin_0.kernel
        return edge_pipeline(
            x, edge_attr, mask,
            k[:d], k[d : 2 * d], k[2 * d :], lin_0.bias,
            lin_1.kernel, lin_1.bias,
            graph, activation=self.activation,
        )


class _MegaEdgeMLP(nn.Module):
    """Inference-trace counterpart of ``_FusedEdgeMLP``: same parameters
    (lin_0 / lin_1 under "edge_mlp"), but the tail act(h_pre)@W2 + masked
    segment-sum runs through the forward-only Pallas mega-kernel
    (``ops.pallas_edge_mlp``) with no custom_vjp boundary.  Returns
    (edge_update, agg_sum) — NOT differentiable (the kernel has no autodiff
    rule); callers gate on forward-only traces."""

    node_dim: int
    edge_dim: int
    hidden: int
    out: int
    activation: str = "swish"

    @nn.compact
    def __call__(self, x, edge_attr, graph: Graph, mask):
        from ..ops.gather import gather_rows
        from ..ops.pallas_edge_mlp import edge_mlp_segment

        d, de = self.node_dim, self.edge_dim
        lin_0 = _TorchLinearParams(2 * d + de, self.hidden, name="lin_0")
        lin_1 = _TorchLinearParams(self.hidden, self.out, name="lin_1")
        k = lin_0.kernel
        xs = x @ k[:d]
        xr = x @ k[d : 2 * d]
        h = (
            gather_rows(xs, graph.senders_aux, graph.senders)
            + gather_rows(xr, graph.receivers_aux, graph.receivers)
            + edge_attr @ k[2 * d :]
            + lin_0.bias
        )
        return edge_mlp_segment(
            h, lin_1.kernel, lin_1.bias, mask,
            graph.receivers, graph.seg_chunk_base, graph.seg_chunk_tile,
            graph.num_receivers, graph.seg_tile_receivers,
            self.activation, interpret=jax.default_backend() == "cpu",
        )


def _use_reg_blocks(graph: Graph, edge_mask) -> bool:
    """Regular per-level block path policy (GCLT_REG_EDGE=0 kills it).

    DEFAULT ON wherever the graph carries the constant-degree layout and
    no runtime (SparseGAT) mask overrides the static one.  Measured on the
    flagship 512x256 v5e workload: the slot-major layout with its
    custom-VJP edge unit (ops.reg_edge: receiver adjoints are
    broadcasts/slice-sums; only the sender scatter remains) cut the train
    step 1388.5 -> 1144.3 ms (loss fingerprint unchanged), and the forward
    is parity with the COO+segment-kernel path (~248 ms inference rollout
    either way — both sit at the unfused [E,256]-traffic floor)."""
    import os

    if graph.reg_blocks is None or edge_mask is not None:
        return False
    return os.environ.get("GCLT_REG_EDGE", "1") not in ("0", "false", "off")


def _use_edge_step_path(graph: Graph, hidden_dim: int, edge_dim: int,
                        activation: str) -> bool:
    """Fused edge-step kernel policy: inference traces only (no autodiff
    rule yet), on backends where the Pallas kernels are on.
    GCLT_EDGE_STEP=0/1 overrides (tests force 1 on CPU interpret)."""
    import os

    from ..ops.fused_edge import _TRAINING_TRACE
    from ..ops.pallas_edge_step import supports_edge_step

    if _TRAINING_TRACE.get():
        return False
    if not supports_edge_step(graph, hidden_dim, edge_dim, activation):
        return False
    flag = os.environ.get("GCLT_EDGE_STEP")
    if flag is not None:
        return flag not in ("0", "false", "off")
    # Default OFF: the fused step measured 2.75 ms/call solo on v5e vs the
    # ~3.4 ms XLA-composed equivalent, but in-model integration overhead
    # (per-step mask-schedule gather, lost multi-output fusions) ate the
    # margin (73 vs 52 ms for the 12-step processor).  Kept for the
    # window-expand groundwork; revisit with hoisted schedules + win_r=256.
    return False


def _use_mega_edge_path(graph: Graph, hidden_dim: int, edge_dim: int,
                        activation: str) -> bool:
    """Forward-only mega-kernel policy: inference traces on backends where
    the Pallas segment kernel is on (the training-trace counterpart is the
    custom_vjp fused unit, which routes through the same kernel internally).
    GCLT_MEGA_EDGE=0 disables."""
    import os

    from ..ops.fused_edge import _TRAINING_TRACE
    from ..ops.pallas_edge_mlp import supports_edge_mlp_segment

    if os.environ.get("GCLT_MEGA_EDGE", "0") in ("0", "false", "off"):
        return False
    ntiles_full = (
        (graph.num_receivers + graph.seg_tile_receivers - 1)
        // max(graph.seg_tile_receivers, 1)
    )
    return (
        not _TRAINING_TRACE.get()
        and supports_edge_mlp_segment(graph, hidden_dim, edge_dim, activation)
        and graph.num_receivers == graph.num_nodes
        and graph.seg_tile_lo == 0
        and graph.seg_tile_hi in (0, ntiles_full)  # no clipped-band support
        and seg_ops.use_pallas_segment_sum()
    )


def _use_fused_edge_path(graph: Graph, hidden_dim: int, edge_dim: int,
                         activation: str) -> bool:
    # Edge-count threshold: measured on v5e at hidden=edge=256, the fused
    # unit is a net LOSS at 65K edges (+10%/epoch, the custom_vjp boundary
    # overhead dominates) and a net WIN at 287K (-4.6% train-step time).
    # use_fused_edge() additionally restricts the path to TRAINING traces
    # (rollout_loss sets the flag): in a forward-only rollout the boundary
    # costs ~20% for nothing (571→684 ms at 512x256 AR-4 inference).
    from ..models.nn import resolve_activation
    from ..ops.fused_edge import use_fused_edge

    try:
        stateless = resolve_activation(activation) is not None
    except ValueError:
        stateless = False
    return (
        stateless
        and graph.seg_chunk_base is not None
        and graph.senders_aux is not None
        and graph.num_receivers == graph.num_nodes
        and graph.num_edges >= 131072
        and hidden_dim % 128 == 0
        and edge_dim % 128 == 0
        and use_fused_edge()
    )


class InteractionNetLayer(nn.Module):
    """One GraphCast-style interaction step (reference src/models.py:166-236).

    edge' = LN_g(edge + MLP_e([h_s ‖ h_r ‖ edge]))
    node' = LN_n(node + MLP_n([h ‖ mean_agg(edge_mlp_out)]))
    """

    node_dim: int
    edge_dim: int
    hidden_dim: int
    activation: str = "swish"
    use_layer_norm: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        edge_attr: jnp.ndarray,
        graph: Graph,
        edge_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mask = _edge_mask(graph, edge_mask)
        if _use_fused_edge_path(graph, self.hidden_dim, self.edge_dim,
                                self.activation):
            edge_update, agg = _FusedEdgeMLP(
                node_dim=self.node_dim, edge_dim=self.edge_dim,
                hidden=self.hidden_dim, out=self.edge_dim,
                activation=self.activation, name="edge_mlp",
            )(x, edge_attr, graph, mask)
        elif _use_mega_edge_path(graph, self.hidden_dim, self.edge_dim,
                                 self.activation):
            edge_update, agg_sum = _MegaEdgeMLP(
                node_dim=self.node_dim, edge_dim=self.edge_dim,
                hidden=self.hidden_dim, out=self.edge_dim,
                activation=self.activation, name="edge_mlp",
            )(x, edge_attr, graph, mask)
            deg = seg_ops.masked_in_degree(graph, mask)
            agg = agg_sum / jnp.maximum(deg, 1.0)[:, None]
        else:
            edge_update = _SplitEdgeMLP(
                node_dim=self.node_dim, edge_dim=self.edge_dim,
                hidden=self.hidden_dim, out=self.edge_dim,
                activation=self.activation, name="edge_mlp",
            )(x, edge_attr, graph)

            use_pallas = (
                graph.seg_chunk_base is not None
                and edge_update.shape[-1] % 128 == 0
                and graph.num_edges >= 16384
                and seg_ops.use_pallas_segment_sum()
            )
            if graph.has_ell and not use_pallas:
                emask = ell_ops.ell_mask(graph, mask)
                r, k = graph.neigh_edge.shape
                upd = jnp.take(
                    edge_update, graph.neigh_edge.reshape(-1), axis=0
                ).reshape(r, k, self.edge_dim)
                agg = jnp.einsum("rkf,rk->rf", upd, emask)
                agg = agg / jnp.maximum(emask.sum(axis=1), 1.0)[:, None]
            else:
                agg = seg_ops.aggregate_mean(edge_update, graph, mask)

        node_in = jnp.concatenate([x, agg], axis=-1)
        node_update = _TwoLayerMLP(
            self.hidden_dim, self.node_dim, self.activation, name="node_mlp"
        )(node_in)

        new_edge = edge_attr + edge_update
        new_x = x + node_update
        if self.use_layer_norm:
            new_edge = PyGLayerNorm(mode="graph", name="edge_norm")(
                new_edge, mask=mask
            )
            new_x = PyGLayerNorm(mode="node", name="node_norm")(new_x)
        return new_x, new_edge


class InteractionNetProcessor(nn.Module):
    """N unshared-weight interaction steps + raw-edge encoder
    (reference src/models.py:239-285).

    The N steps run under ``flax.linen.scan`` with the parameter pytree
    stacked along a leading axis: XLA compiles ONE step body instead of
    inlining N copies — same math and same per-step parameters as the
    reference's ModuleList, but ~N× smaller HLO (compile time matters:
    the flagship uses 12 steps, unrolled 4× again by the AR rollout)."""

    node_dim: int
    raw_edge_dim: int
    edge_latent_dim: int
    hidden_dim: int
    num_steps: int
    activation: str = "swish"
    use_layer_norm: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        graph: Graph,
        edge_attr_raw: Optional[jnp.ndarray] = None,
        edge_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        lazy = _use_lazy_processor(
            graph, self.hidden_dim, self.edge_latent_dim, self.activation,
            self.use_layer_norm,
        )
        raw = edge_attr_raw if edge_attr_raw is not None else graph.edge_attr
        if (lazy and edge_attr_raw is None
                and _use_reg_blocks(graph, edge_mask)):
            # The lazy scan body runs the regular-block layout: the edge
            # carrier v must be initialized in the SAME row order.
            raw = graph.reg_blocks.edge_attr
        e = TorchLinear(self.edge_latent_dim, name="edge_encoder_lin")(raw)
        act = resolve_activation(self.activation)
        e = PReLU(name="edge_encoder_act")(e) if act is None else act(e)

        # GCLT_SCAN_REMAT selects the scan-step remat policy (trace-time):
        #   none (default) — no inner remat: the trainers' OUTER AR-step
        #          checkpoint already bounds live memory to one AR step, and
        #          double remat recomputes each step's forward twice
        #          (measured 1959 -> 1441 ms per 512x256 train step);
        #   dots — save matmul outputs, recompute elementwise/gather work;
        #   full — save only the (x, e) carries, recompute everything
        #          (lowest memory: use for large batch x 512x256 BPTT where
        #          one AR step's saved intermediates, ~0.5 GB x num_steps x
        #          batch, would not fit).
        import os as _os

        _mode = _os.environ.get("GCLT_SCAN_REMAT", "none").lower()
        base = _LazyINStep if lazy else _ScannedINStep
        if _mode == "none":
            body = base
        elif _mode == "dots":
            body = nn.remat(
                base, prevent_cse=False,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )
        else:
            body = nn.remat(base, prevent_cse=False)
        kwargs = dict(
            node_dim=self.node_dim,
            edge_dim=self.edge_latent_dim,
            hidden_dim=self.hidden_dim,
            activation=self.activation,
            name="steps",
        )
        if not lazy:
            kwargs["use_layer_norm"] = self.use_layer_norm
        scanned = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=nn.broadcast,
            length=self.num_steps,
        )(**kwargs)
        if lazy:
            a0 = jnp.ones((self.edge_latent_dim,), jnp.float32)
            c0 = jnp.zeros((self.edge_latent_dim,), jnp.float32)
            (x, e, _, _), _ = scanned((x, e, a0, c0), graph, edge_mask)
        else:
            (x, e), _ = scanned((x, e), graph, edge_mask)
        return x


class _LNParams(nn.Module):
    """Params-only declarator matching ``PyGLayerNorm``'s (weight, bias) —
    used by the lazy-LN scan body, which applies the affine itself."""

    features: int

    def setup(self):
        self.weight = self.param(
            "weight", nn.initializers.ones, (self.features,)
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features,)
        )

    def __call__(self):  # pragma: no cover - params-only module
        return self.weight, self.bias


def _use_lazy_processor(graph: Graph, hidden_dim: int, edge_dim: int,
                        activation: str, use_layer_norm: bool) -> bool:
    """Lazy edge-LN scan policy (GCLT_LAZY_EDGE=0/1, default: on wherever
    the Pallas segment kernel is on).  Requires graph-mode LN on edges and a
    stateless activation (the fold rewrites the next step's edge projection;
    PReLU's learned slope would land inside the folded weights)."""
    import os

    flag = os.environ.get("GCLT_LAZY_EDGE")
    try:
        stateless = resolve_activation(activation) is not None
    except ValueError:
        stateless = False
    structural = (
        use_layer_norm
        and stateless
        and graph.senders_aux is not None
        and graph.num_receivers == graph.num_nodes
    )
    if flag is not None:
        # Explicit opt-in/out: structural conditions only (the body's inner
        # tail degrades gracefully to plain XLA at any size — lets CPU
        # parity tests exercise the restructure on small graphs).
        return flag not in ("0", "false", "off") and structural
    return (
        seg_ops.use_pallas_segment_sum()
        and structural
        and graph.seg_chunk_base is not None
        and hidden_dim % 128 == 0
        and edge_dim % 128 == 0
        and graph.num_edges >= 16384
    )


class _EdgeMLPParams(nn.Module):
    """Params-only declarator for the edge MLP (lin_0 / lin_1 children,
    bit-identical init to ``_SplitEdgeMLP``'s)."""

    in0: int
    hid: int
    out: int

    @nn.compact
    def __call__(self):
        l0 = _TorchLinearParams(self.in0, self.hid, name="lin_0")
        l1 = _TorchLinearParams(self.hid, self.out, name="lin_1")
        return l0.kernel, l0.bias, l1.kernel, l1.bias


class _LazyINLayer(nn.Module):
    """One InteractionNet step with the edge LayerNorm applied LAZILY.

    The standard step materializes three full [E, De] passes around the
    residual+LN tail (read e, read u, write z; stats; read z, write LN(z)).
    This layer carries the PRE-norm edge state ``v`` plus the per-feature
    affine ``(a, c)`` of the previous step's LN, so that

        e_t        = a ∘ v + c                       (never materialized)
        h_pre      = xs[s] + xr[r] + e_t @ W1e + b1
                   = xs[s] + xr[r] + v @ (a[:,None]·W1e) + (b1 + c@W1e)
        v'         = e_t + u = a ∘ v + c + u          (one fused pass)
        (μ, σ)     = masked graph-mode stats of v'
        a', c'     = γ/σ,  β − γμ/σ

    — identical math to ``InteractionNetLayer`` with ``PyGLayerNorm
    (mode="graph")`` on edges (same masked stats, same ε), with the LN
    application folded into the NEXT step's edge projection.  The last
    step's edge state is discarded by the processor, so the fold never
    needs undoing.  Parameter tree is identical to ``InteractionNetLayer``'s
    ({edge_mlp,node_mlp,edge_norm,node_norm}) — checkpoints are
    interchangeable (tests/test_gnn_parity.py).

    Call: (x, v, a, c) -> (x', v', a', c').
    Reference semantics: src/models.py:166-236.
    """

    node_dim: int
    edge_dim: int
    hidden_dim: int
    activation: str = "swish"

    @nn.compact
    def __call__(self, x, v, a, c, graph: Graph, edge_mask):
        mask = _edge_mask(graph, edge_mask)
        d, de, hid = self.node_dim, self.edge_dim, self.hidden_dim

        k0, b0, k1, b1 = _EdgeMLPParams(
            2 * d + de, hid, de, name="edge_mlp"
        )()
        ln = _LNParams(de, name="edge_norm")

        w1s, w1r, w1e = k0[:d], k0[d:2 * d], k0[2 * d:]
        w1e_eff = a[:, None].astype(w1e.dtype) * w1e
        b1_eff = b0 + c.astype(w1e.dtype) @ w1e

        if (_use_reg_blocks(graph, edge_mask)
                and v.shape[0] == graph.reg_blocks.rows_padded):
            # Constant-degree per-level blocks (graphs.structure
            # .RegularBlocks): receiver rows BROADCAST (row r·K+k has
            # receiver r) and aggregation is a reshape-sum — the only
            # remaining irregular op is the sender gather.  Pure XLA:
            # differentiable, fusable, and the reshape-sum adjoint is a
            # broadcast instead of a scatter.  ``v`` is carried in the
            # block row layout (the processor initialized it from
            # rb.edge_attr).
            rb = graph.reg_blocks
            from ..ops.reg_edge import RegStatic, reg_edge_tail

            static = RegStatic(
                block_recv=rb.block_recv, block_k=rb.block_k,
                num_nodes=graph.num_receivers,
                tile_receivers=graph.seg_tile_receivers or 256,
                s_tile_lo=rb.s_tile_lo, s_tile_hi=rb.s_tile_hi,
                activation=self.activation,
                interpret=jax.default_backend() == "cpu",
            )
            u, agg_sum = reg_edge_tail(
                static, x, v, rb.mask.astype(x.dtype), rb.senders,
                rb.s_perm, rb.s_sorted, rb.s_chunk_base, rb.s_chunk_tile,
                w1s, w1r, w1e_eff, b1_eff, k1, b1,
            )
            deg = seg_ops.masked_in_degree(graph, edge_mask)
            agg = agg_sum / jnp.maximum(
                deg, 1.0
            )[:, None].astype(agg_sum.dtype)
            node_in = jnp.concatenate([x, agg], axis=-1)
            node_update = _TwoLayerMLP(
                hid, d, self.activation, name="node_mlp"
            )(node_in)
            new_x = PyGLayerNorm(mode="node", name="node_norm")(
                x + node_update
            )
            # Lazy-LN residual + masked graph-mode stats (pad rows carry u
            # but are mask-excluded; their values are never read).
            v_new = a.astype(v.dtype)[None, :] * v + c.astype(v.dtype) + u
            f32 = jnp.float32
            w = rb.mask.astype(f32)[:, None]
            vf = v_new.astype(f32)
            denom = jnp.maximum(w.sum() * de, 1.0)
            mu = (vf * w).sum() / denom
            var = jnp.maximum(
                (jnp.square(vf) * w).sum() / denom - jnp.square(mu), 0.0
            )
            inv_sigma = jax.lax.rsqrt(var + 1e-5)
            gamma = ln.weight.astype(f32)
            beta = ln.bias.astype(f32)
            return new_x, v_new, gamma * inv_sigma, \
                beta - gamma * mu * inv_sigma

        if _use_edge_step_path(graph, hid, de, self.activation):
            # The whole edge side of the step in ONE Pallas pass: receiver
            # expand, edge projection, act@W2, lazy residual, LN stats,
            # aggregation — only the sender gather stays in XLA.
            from ..ops.pallas_edge_step import edge_step_fused

            ss = graph.step_sched
            xsg = jnp.take(x @ w1s, graph.senders, axis=0)
            v_new, agg_sum, stats = edge_step_fused(
                xsg, v, x @ w1r, w1e_eff, b1_eff, k1, b1,
                a.astype(jnp.float32), c.astype(jnp.float32), mask,
                ss.base, ss.tile, ss.lo, ss.hi, ss.rwin, ss.recv,
                graph.num_receivers, graph.seg_tile_receivers,
                ss.win_r, ss.xr_rows, self.activation,
                interpret=jax.default_backend() == "cpu",
            )
            deg = seg_ops.masked_in_degree(graph, mask)
            agg = agg_sum / jnp.maximum(deg, 1.0)[:, None]

            node_in = jnp.concatenate([x, agg], axis=-1)
            node_update = _TwoLayerMLP(
                hid, d, self.activation, name="node_mlp"
            )(node_in)
            new_x = PyGLayerNorm(mode="node", name="node_norm")(
                x + node_update
            )
            sm, sq, cnt = stats[0], stats[1], stats[2]
            denom = jnp.maximum(cnt * de, 1.0)
            mu = sm / denom
            var = jnp.maximum(sq / denom - jnp.square(mu), 0.0)
            inv_sigma = jax.lax.rsqrt(var + 1e-5)
            gamma = ln.weight.astype(jnp.float32)
            beta = ln.bias.astype(jnp.float32)
            return new_x, v_new, gamma * inv_sigma, \
                beta - gamma * mu * inv_sigma

        if _use_fused_edge_path(graph, hid, de, self.activation):
            from ..ops.fused_edge import edge_pipeline

            u, agg = edge_pipeline(
                x, v, mask, w1s, w1r, w1e_eff, b1_eff, k1, b1, graph,
                activation=self.activation,
            )
        else:
            from ..ops.gather import gather_rows

            h = (
                gather_rows(x @ w1s, graph.senders_aux, graph.senders)
                + gather_rows(x @ w1r, graph.receivers_aux, graph.receivers)
                + v @ w1e_eff
                + b1_eff
            )
            if _use_mega_edge_path(graph, hid, de, self.activation):
                from ..ops.pallas_edge_mlp import edge_mlp_segment

                u, agg_sum = edge_mlp_segment(
                    h, k1, b1, mask,
                    graph.receivers, graph.seg_chunk_base,
                    graph.seg_chunk_tile, graph.num_receivers,
                    graph.seg_tile_receivers, self.activation,
                    interpret=jax.default_backend() == "cpu",
                )
            else:
                act = resolve_activation(self.activation)
                u = act(h) @ k1 + b1
                agg_sum = seg_ops.aggregate_sum(u, graph, mask)
            deg = seg_ops.masked_in_degree(graph, mask)
            agg = agg_sum / jnp.maximum(deg, 1.0)[:, None]

        node_in = jnp.concatenate([x, agg], axis=-1)
        node_update = _TwoLayerMLP(
            hid, d, self.activation, name="node_mlp"
        )(node_in)
        new_x = PyGLayerNorm(mode="node", name="node_norm")(
            x + node_update
        )

        # Residual in the pre-norm space + masked graph-mode stats (f32,
        # PyGLayerNorm semantics: scalar mean/var over masked elements).
        v_new = a.astype(v.dtype)[None, :] * v + c.astype(v.dtype) + u
        vf = v_new.astype(jnp.float32)
        w = mask.astype(jnp.float32)[:, None]
        denom = jnp.maximum(w.sum() * de, 1.0)
        mu = (vf * w).sum() / denom
        var = (jnp.square(vf - mu) * w).sum() / denom
        inv_sigma = jax.lax.rsqrt(var + 1e-5)
        gamma = ln.weight.astype(jnp.float32)
        beta = ln.bias.astype(jnp.float32)
        a_new = gamma * inv_sigma
        c_new = beta - gamma * mu * inv_sigma
        return new_x, v_new, a_new, c_new


class _LazyINStep(nn.Module):
    """scan-body adapter for the lazy-LN step: carry = (x, v, a, c)."""

    node_dim: int
    edge_dim: int
    hidden_dim: int
    activation: str = "swish"

    @nn.compact
    def __call__(self, carry, graph: Graph, edge_mask):
        x, v, a, c = carry
        x, v, a, c = _LazyINLayer(
            node_dim=self.node_dim,
            edge_dim=self.edge_dim,
            hidden_dim=self.hidden_dim,
            activation=self.activation,
            name="layer",
        )(x, v, a, c, graph, edge_mask)
        return (x, v, a, c), None


class _ScannedINStep(nn.Module):
    """scan-body adapter: carry = (node state, edge state)."""

    node_dim: int
    edge_dim: int
    hidden_dim: int
    activation: str = "swish"
    use_layer_norm: bool = True

    @nn.compact
    def __call__(self, carry, graph: Graph, edge_mask):
        x, e = carry
        x, e = InteractionNetLayer(
            node_dim=self.node_dim,
            edge_dim=self.edge_dim,
            hidden_dim=self.hidden_dim,
            activation=self.activation,
            use_layer_norm=self.use_layer_norm,
            name="layer",
        )(x, e, graph, edge_mask)
        return (x, e), None
