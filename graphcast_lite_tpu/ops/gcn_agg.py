"""Fused GCN edge aggregation with a layout-matched backward.

The GCN/SimpleConv aggregation ``agg[r] = Σ_e scale[e] · x[sender[e]]``
differentiates to a scatter-add over SENDERS — on TPU an unsorted XLA
scatter, the dominant cost of the encoder/decoder backward (reference PyG
does the same with CUDA atomics, src/models.py:219-236).  This custom-VJP
unit picks the fastest formulation PER DIRECTION from the graph's static
degree structure:

  forward  (segment over receivers, sorted)   — Pallas one-hot-MXU kernel
  backward (segment over senders)             — transpose-ELL dense gather
             d_x[n] = Σ_k t_mask[n,k]·scale[t_edge[n,k]]·d_agg[t_recv[n,k]]
           when the out-degree is small+bounded (encoder grid senders ≤ 3,
           multimesh ≤ 12: a scatter-free einsum); otherwise the Pallas
           kernel over the sender-sorted permutation.

``scale`` is non-differentiated by design: in GCN it is the symmetric norm
× the 0/1 edge mask, whose only upstream dependency is the integer degree
of a binary mask — every gradient path through it is exactly zero (masks
come from comparisons).  Do NOT use this op where a learned per-edge weight
(attention) needs gradients.

Numerics match ``jax.grad`` of the unfused gather/segment expression
(tests/test_gcn_agg.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_segment import segment_sum_sorted

__all__ = ["gcn_aggregate", "supports_gcn_aggregate"]


class _Static(NamedTuple):
    num_nodes: int
    num_receivers: int
    tile_receivers: int
    bwd_mode: str          # "tell" | "pallas"
    interpret: bool
    r_tile_lo: int = 0     # clipped-band bounds (build_schedule_clipped)
    r_tile_hi: int = 0
    s_tile_lo: int = 0
    s_tile_hi: int = 0


def supports_gcn_aggregate(graph, features: int) -> bool:
    """Policy: TRAINING traces only (the unit exists to reroute the
    backward's scatter; in a forward-only program the custom_vjp boundary
    just blocks fusion — same trade-off as ops.fused_edge), plus the Pallas
    schedule + either transpose-ELL or the sender sort-aux."""
    import os

    from .fused_edge import _TRAINING_TRACE
    from .segment import use_pallas_segment_sum

    # Default OFF for the single-chip model: at the flagship the custom_vjp
    # boundary costs more than the backward reroute saves (1687 vs 1642 ms/
    # train step measured) — the encoder/decoder backward was already cheap.
    # GCLT_GCN_AGG=1 opts in; the sharded per-shard bodies use the
    # underlying op directly regardless (their fallback is a plain XLA
    # scatter, which IS slower there).
    flag = os.environ.get("GCLT_GCN_AGG")
    if flag != "1":
        return False
    return (
        _TRAINING_TRACE.get()
        and graph.seg_chunk_base is not None
        and features % 128 == 0
        and graph.num_edges >= 16384
        and (graph.t_neigh_edge is not None or graph.senders_aux is not None)
        and use_pallas_segment_sum()
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gcn_agg(static: _Static, x, scale, senders, receivers,
             r_base, r_tile, s_perm, s_sorted, s_base, s_tile,
             t_recv, t_edge, t_mask):
    out, _ = _fwd(static, x, scale, senders, receivers, r_base, r_tile,
                  s_perm, s_sorted, s_base, s_tile, t_recv, t_edge, t_mask)
    return out


def _fwd(static, x, scale, senders, receivers, r_base, r_tile,
         s_perm, s_sorted, s_base, s_tile, t_recv, t_edge, t_mask):
    msgs = jnp.take(x, senders, axis=0) * scale[:, None]
    agg = segment_sum_sorted(
        msgs, receivers, r_base, r_tile,
        static.num_receivers, static.tile_receivers, static.interpret,
        tile_lo=static.r_tile_lo, tile_hi=static.r_tile_hi,
    )
    res = (scale, senders, receivers, r_base, r_tile,
           s_perm, s_sorted, s_base, s_tile, t_recv, t_edge, t_mask)
    return agg, res


def _bwd(static, res, d_agg):
    (scale, senders, receivers, r_base, r_tile,
     s_perm, s_sorted, s_base, s_tile, t_recv, t_edge, t_mask) = res

    if static.bwd_mode == "tell":
        n, k = t_recv.shape
        rows = jnp.take(d_agg, t_recv.reshape(-1), axis=0)
        rows = rows.reshape(n, k, d_agg.shape[-1])
        w = jnp.take(scale, t_edge.reshape(-1)).reshape(n, k) * t_mask.astype(
            scale.dtype
        )
        d_x = jnp.einsum("nkf,nk->nf", rows, w)
    else:
        d_msgs = jnp.take(d_agg, receivers, axis=0) * scale[:, None]
        d_x = segment_sum_sorted(
            jnp.take(d_msgs, s_perm, axis=0), s_sorted, s_base, s_tile,
            static.num_nodes, static.tile_receivers, static.interpret,
            tile_lo=static.s_tile_lo, tile_hi=static.s_tile_hi,
        )

    def int_zero(a):
        return np.zeros(a.shape, dtype=jax.dtypes.float0)

    return (d_x, jnp.zeros_like(scale),
            int_zero(senders), int_zero(receivers),
            int_zero(r_base), int_zero(r_tile),
            int_zero(s_perm), int_zero(s_sorted),
            int_zero(s_base), int_zero(s_tile),
            int_zero(t_recv), int_zero(t_edge),
            jnp.zeros_like(t_mask))


_gcn_agg.defvjp(_fwd, _bwd)


def gcn_aggregate(x: jnp.ndarray, scale: jnp.ndarray, graph) -> jnp.ndarray:
    """agg[r] = Σ_{e} scale[e] · x[sender[e]]  ([R, F]; scale pre-masked,
    NON-differentiated — GCN norms/masks only).

    Chooses the backward formulation from the graph's static structure:
    transpose-ELL dense gather when available, else Pallas sender-sorted
    segment sum.  Callers gate on :func:`supports_gcn_aggregate`.
    """
    use_tell = graph.t_neigh_edge is not None
    aux = graph.senders_aux
    static = _Static(
        num_nodes=graph.num_nodes,
        num_receivers=graph.num_receivers,
        tile_receivers=graph.seg_tile_receivers,
        bwd_mode="tell" if use_tell else "pallas",
        interpret=jax.default_backend() == "cpu",
        r_tile_lo=graph.seg_tile_lo,
        r_tile_hi=graph.seg_tile_hi,
        s_tile_lo=aux.tile_lo if aux is not None else 0,
        s_tile_hi=aux.tile_hi if aux is not None else 0,
    )
    e = graph.senders.shape[0]
    dummy_e = jnp.zeros((1,), jnp.int32)
    dummy_t = jnp.zeros((1, 1), jnp.int32)
    dummy_tm = jnp.zeros((1, 1), scale.dtype)
    seg_recv = (graph.seg_recv if graph.seg_recv is not None
                else graph.receivers)
    return _gcn_agg(
        static, x, scale, graph.senders, seg_recv,
        graph.seg_chunk_base, graph.seg_chunk_tile,
        aux.perm if aux is not None else dummy_e,
        aux.idx_sorted if aux is not None else dummy_e,
        aux.chunk_base if aux is not None else dummy_e,
        aux.chunk_tile if aux is not None else dummy_e,
        graph.t_neigh_recv if use_tell else dummy_t,
        graph.t_neigh_edge if use_tell else dummy_t,
        graph.t_neigh_mask if use_tell else dummy_tm,
    )
