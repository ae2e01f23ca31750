"""ELL (padded neighbor-table) aggregation: the TPU-native scatter-free path.

Message passing as dense row gathers + masked reductions over the fixed K
(max-degree) axis.  XLA lowers the gather to a vectorized dynamic-gather and
fuses the mask/reduce arithmetic — no scatter-add serialization, static
shapes throughout.  Preferred layout for the multimesh processor hot loop
(in-degree ≤ ~16 on icosahedral multi-meshes).

Runtime edge masks (SparseGAT pruning) live in COO edge space [E_pad]; the
``neigh_edge`` table maps ELL slots back to COO edge ids so one mask array
serves both layouts.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..graphs.structure import Graph

__all__ = [
    "ell_mask",
    "gather_neighbors",
    "aggregate_sum_ell",
    "aggregate_mean_ell",
    "softmax_ell",
]


def ell_mask(graph: Graph, edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """[R, K] validity mask, honoring a runtime COO-space edge mask."""
    base = graph.neigh_mask
    if edge_mask is None:
        return base
    return base * jnp.take(edge_mask, graph.neigh_edge, axis=0)


def gather_neighbors(x: jnp.ndarray, graph: Graph) -> jnp.ndarray:
    """[R, K, F] sender features for each receiver's neighbor slots."""
    r, k = graph.neigh_senders.shape
    return jnp.take(x, graph.neigh_senders.reshape(-1), axis=0).reshape(
        r, k, x.shape[-1]
    )


def aggregate_sum_ell(
    x: jnp.ndarray,
    graph: Graph,
    edge_mask: Optional[jnp.ndarray] = None,
    edge_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """out[r] = Σ_k mask[r,k] · scale[r,k] · x[neigh[r,k]] — [R, F].

    ``edge_scale``: optional per-edge scalar in COO space [E_pad] (e.g. GCN
    norms or attention weights), gathered through ``neigh_edge``.
    """
    mask = ell_mask(graph, edge_mask)
    if edge_scale is not None:
        mask = mask * jnp.take(edge_scale, graph.neigh_edge, axis=0)
    neigh = gather_neighbors(x, graph)
    return jnp.einsum("rkf,rk->rf", neigh, mask)


def aggregate_mean_ell(
    x: jnp.ndarray,
    graph: Graph,
    edge_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Masked mean over live neighbor slots; isolated receivers get 0."""
    mask = ell_mask(graph, edge_mask)
    neigh = gather_neighbors(x, graph)
    total = jnp.einsum("rkf,rk->rf", neigh, mask)
    deg = mask.sum(axis=1)
    return total / jnp.maximum(deg, 1.0)[:, None]


def softmax_ell(
    logits_per_edge: jnp.ndarray,
    graph: Graph,
    edge_mask: Optional[jnp.ndarray] = None,
    extra_logit: Optional[jnp.ndarray] = None,
):
    """Softmax over each receiver's K neighbor slots (plus optional self term).

    Args:
      logits_per_edge: [E_pad] or [E_pad, H] logits in COO edge space.
      extra_logit: optional [R] or [R, H] self-loop logit joining the softmax.

    Returns:
      (slot_weights [R, K] or [R, K, H], self_weights or None).
    """
    squeeze = logits_per_edge.ndim == 1
    if squeeze:
        logits_per_edge = logits_per_edge[:, None]
        if extra_logit is not None:
            extra_logit = extra_logit[:, None]
    h = logits_per_edge.shape[-1]
    r, k = graph.neigh_edge.shape

    mask = ell_mask(graph, edge_mask)  # [R, K]
    slot_logits = jnp.take(logits_per_edge, graph.neigh_edge.reshape(-1), axis=0)
    slot_logits = slot_logits.reshape(r, k, h)
    neg = jnp.asarray(-1e30, dtype=slot_logits.dtype)
    slot_logits = jnp.where(mask[..., None] > 0, slot_logits, neg)

    m = slot_logits.max(axis=1)  # [R, H]
    if extra_logit is not None:
        m = jnp.maximum(m, extra_logit)
    m = jnp.maximum(m, neg)

    ex = jnp.exp(slot_logits - m[:, None, :]) * mask[..., None]
    denom = ex.sum(axis=1)
    self_exp = None
    if extra_logit is not None:
        self_exp = jnp.exp(extra_logit - m)
        denom = denom + self_exp
    denom = jnp.maximum(denom, 1e-16)

    w = ex / denom[:, None, :]
    self_w = self_exp / denom if self_exp is not None else None
    if squeeze:
        w = w[..., 0]
        self_w = self_w[..., 0] if self_w is not None else None
    return w, self_w
