"""Aggregation primitives for message passing on static padded graphs.

Two interchangeable layouts (see ``graphs.structure.Graph``):

* **COO** (`*_coo`): edges sorted by receiver; aggregation via
  ``jax.ops.segment_sum`` with ``indices_are_sorted=True``.  This is the
  correctness oracle and the general path (works for any degree
  distribution, e.g. the high-variance G2M ε-ball graph).
* **ELL** (`*_ell`): padded per-receiver neighbor tables; aggregation is a
  dense row gather + masked reduction over the K axis — no scatter at all,
  which is the TPU-friendly formulation (gathers vectorize on the VPU/MXU;
  scatter-adds serialize).  Used for the processor hot loop where the
  multimesh in-degree is small and bounded.

All functions take explicit masks so that SparseGAT edge pruning (runtime
edge-mask updates) and shape padding are handled uniformly: a masked-out edge
contributes exactly zero to sums, means, softmax denominators, and degrees.

Replaces the reference's PyG scatter/segment CUDA kernels
(reference src/models.py:219-221, torch_geometric.utils.scatter).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..graphs.structure import Graph

__all__ = [
    "gather_senders",
    "aggregate_sum",
    "aggregate_mean",
    "segment_softmax_coo",
    "masked_in_degree",
]

_EPS = 1e-16


def gather_senders(x: jnp.ndarray, graph: Graph) -> jnp.ndarray:
    """Per-edge sender features [E_pad, F] (COO layout)."""
    return jnp.take(x, graph.senders, axis=0)


def masked_in_degree(graph: Graph, edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """[R] float32 in-degree per receiver under the (possibly pruned) mask.

    With no runtime mask (or the graph's own mask) the degree is a host
    constant (``graph.static_in_degree``) — no device reduction at all;
    SparseGAT's pruned masks take the segment-sum path."""
    if (
        (edge_mask is None or edge_mask is graph.edge_mask)
        and graph.static_in_degree is not None
    ):
        return graph.static_in_degree
    mask = graph.edge_mask if edge_mask is None else edge_mask
    return jax.ops.segment_sum(
        mask,
        graph.receivers,
        num_segments=graph.num_receivers,
        indices_are_sorted=True,
    )


def use_pallas_segment_sum() -> bool:
    """Kernel path policy: on by default on TPU backends, off elsewhere;
    override with GCLT_PALLAS_SEGMENT=0/1."""
    import os

    flag = os.environ.get("GCLT_PALLAS_SEGMENT")
    if flag is not None:
        return flag not in ("0", "false", "off")
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


def aggregate_sum(
    messages: jnp.ndarray,
    graph: Graph,
    edge_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sum messages [E_pad, F] into receivers -> [R, F] (COO path).

    On TPU, routes through the Pallas sorted-segment kernel (one-hot-matmul
    accumulation, `ops.pallas_segment`); falls back to
    ``jax.ops.segment_sum`` elsewhere or when the graph carries no tiling.
    """
    mask = graph.edge_mask if edge_mask is None else edge_mask
    masked = messages * mask[:, None]
    if graph.const_in_degree > 0 and masked.ndim == 2:
        # Constant in-degree + sorted receivers (M2G decoder: exactly 3
        # senders per grid node): the segment reduction IS a reshape-sum —
        # a dense op XLA fuses freely, no kernel or scatter needed.
        k, r0 = graph.const_in_degree, graph.num_const_receivers
        out = masked.reshape(r0, k, masked.shape[-1]).astype(
            jnp.float32
        ).sum(axis=1).astype(masked.dtype)
        if r0 < graph.num_receivers:
            out = jnp.pad(out, ((0, graph.num_receivers - r0), (0, 0)))
        return out
    if (
        graph.seg_chunk_base is not None
        and masked.ndim == 2
        and masked.shape[-1] % 128 == 0
        and graph.num_edges >= 16384  # kernel overhead beats XLA only at scale
        and use_pallas_segment_sum()
    ):
        from .pallas_segment import segment_sum_sorted

        recv = (graph.seg_recv if graph.seg_recv is not None
                else graph.receivers)
        return segment_sum_sorted(
            masked,
            recv,
            graph.seg_chunk_base,
            graph.seg_chunk_tile,
            graph.num_receivers,
            graph.seg_tile_receivers,
            interpret=jax.default_backend() == "cpu",
            tile_lo=graph.seg_tile_lo,
            tile_hi=graph.seg_tile_hi,
        )
    return jax.ops.segment_sum(
        masked,
        graph.receivers,
        num_segments=graph.num_receivers,
        indices_are_sorted=True,
    )


def aggregate_mean(
    messages: jnp.ndarray,
    graph: Graph,
    edge_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean of messages into receivers; receivers with no live edges get 0.

    Matches PyG ``scatter(..., reduce="mean")`` semantics (zero for isolated
    nodes), used by SimpleConv and the InteractionNet aggregation.
    """
    mask = graph.edge_mask if edge_mask is None else edge_mask
    total = aggregate_sum(messages, graph, mask)
    deg = masked_in_degree(graph, mask)
    return total / jnp.maximum(deg, 1.0)[:, None]


def segment_softmax_coo(
    logits: jnp.ndarray,
    graph: Graph,
    edge_mask: Optional[jnp.ndarray] = None,
    extra_logit: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Numerically-stable softmax over each receiver's incoming edges.

    Args:
      logits: [E_pad] or [E_pad, H] attention logits.
      edge_mask: optional pruning mask overriding the graph's.
      extra_logit: optional [R] or [R, H] per-receiver extra term that joins
        the softmax (the PyG self-loop logit for GAT with
        ``add_self_loops=True``).

    Returns:
      (edge_weights with zeros on masked edges, self_weights or None) —
      normalized so that Σ_edges + self == 1 for receivers with any term.
    """
    mask = graph.edge_mask if edge_mask is None else edge_mask
    squeeze = logits.ndim == 1
    if squeeze:
        logits = logits[:, None]
        if extra_logit is not None:
            extra_logit = extra_logit[:, None]
    mask_b = mask[:, None]

    neg = jnp.asarray(-1e30, dtype=logits.dtype)
    masked_logits = jnp.where(mask_b > 0, logits, neg)
    seg_max = jax.ops.segment_max(
        masked_logits,
        graph.receivers,
        num_segments=graph.num_receivers,
        indices_are_sorted=True,
    )
    if extra_logit is not None:
        seg_max = jnp.maximum(seg_max, extra_logit)
    seg_max = jnp.maximum(seg_max, neg)  # receivers with nothing: keep finite
    seg_max = jax.lax.stop_gradient(seg_max)

    shifted = jnp.exp(masked_logits - seg_max[graph.receivers]) * mask_b
    denom = jax.ops.segment_sum(
        shifted,
        graph.receivers,
        num_segments=graph.num_receivers,
        indices_are_sorted=True,
    )
    self_exp = None
    if extra_logit is not None:
        self_exp = jnp.exp(extra_logit - seg_max)
        denom = denom + self_exp
    denom = jnp.maximum(denom, _EPS)

    edge_w = shifted / denom[graph.receivers]
    self_w = self_exp / denom if self_exp is not None else None
    if squeeze:
        edge_w = edge_w[:, 0]
        self_w = self_w[:, 0] if self_w is not None else None
    return edge_w, self_w
