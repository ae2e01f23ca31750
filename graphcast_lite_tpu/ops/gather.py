"""Graph row-gathers with Pallas-accelerated adjoints.

``jnp.take(x, idx)`` differentiates to an UNSORTED scatter-add — the
slowest op class on TPU and the dominant cost of the training backward
(every message-passing step gathers sender/receiver rows).  Here the
adjoint is re-routed:

    d/dx gather(x, idx) : g  ->  segment_sum(g[perm], idx_sorted)

where ``perm`` sorts the edge index by target node — precomputed once per
static graph — so the scatter becomes the receiver-sorted segment sum the
Pallas kernel (``ops.pallas_segment``) already handles as one-hot MXU
matmuls.  Falls back to plain ``jnp.take`` (XLA scatter adjoint) when the
graph carries no sort-aux or the kernel is disabled.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["GatherAux", "build_gather_aux", "gather_rows"]

from flax import struct


@struct.dataclass
class GatherAux:
    """Sort-aux for one index array (senders or receivers of a graph)."""

    idx: jnp.ndarray            # [E_pad] the gather indices
    perm: jnp.ndarray           # [E_pad] argsort(idx) (stable)
    idx_sorted: jnp.ndarray     # [E_pad] = idx[perm]
    chunk_base: jnp.ndarray     # pallas chunk schedule over idx_sorted
    chunk_tile: jnp.ndarray
    num_targets: int = struct.field(pytree_node=False, default=0)
    tile_receivers: int = struct.field(pytree_node=False, default=0)
    # Clipped-band bounds (ops.pallas_segment.build_schedule_clipped):
    # rows outside [tile_lo, tile_hi) are exact zeros in the adjoint.
    tile_lo: int = struct.field(pytree_node=False, default=0)
    tile_hi: int = struct.field(pytree_node=False, default=0)


def build_gather_aux(
    idx: np.ndarray, num_targets: int, tile_receivers: int = 256,
    n_real: int | None = None,
) -> GatherAux:
    """``n_real``: number of REAL edges; padding entries (rows >= n_real)
    are repointed inside the real target band so bipartite graphs keep a
    tight clipped schedule (their zero adjoints land on a real row and are
    exact zeros either way).

    INVARIANT for consumers: because padded entries of ``aux.idx`` now point
    at a REAL node, forward gathers through this aux return garbage (a real
    node's features) in padded rows — NOT zeros.  Every consumer must
    pre-multiply edge contributions by the edge mask before aggregating
    (the repo-wide padded-edge rule, see CLAUDE.md invariants); the adjoint
    is unaffected since masked rows carry zero cotangents."""
    from .pallas_segment import build_schedule_clipped

    idx = np.asarray(idx, np.int32).copy()
    if n_real is not None and 0 < n_real < idx.shape[0]:
        idx[n_real:] = idx[:n_real].min()
    perm = np.argsort(idx, kind="stable").astype(np.int32)
    idx_sorted = idx[perm]
    base, tile, t_lo, t_hi = build_schedule_clipped(
        idx_sorted, num_targets, tile_receivers
    )
    return GatherAux(
        idx=jnp.asarray(idx),
        perm=jnp.asarray(perm),
        idx_sorted=jnp.asarray(idx_sorted),
        chunk_base=jnp.asarray(base),
        chunk_tile=jnp.asarray(tile),
        num_targets=int(num_targets),
        tile_receivers=tile_receivers,
        tile_lo=t_lo,
        tile_hi=t_hi,
    )


@jax.custom_vjp
def _gather_pallas_adj(x: jnp.ndarray, aux: GatherAux) -> jnp.ndarray:
    return jnp.take(x, aux.idx, axis=0)


def _gather_fwd(x, aux):
    return jnp.take(x, aux.idx, axis=0), (aux,)


def _gather_bwd(res, g):
    (aux,) = res
    from .pallas_segment import segment_sum_sorted

    g_sorted = jnp.take(g, aux.perm, axis=0)
    dx = segment_sum_sorted(
        g_sorted, aux.idx_sorted, aux.chunk_base, aux.chunk_tile,
        aux.num_targets, aux.tile_receivers,
        interpret=jax.default_backend() == "cpu",
        tile_lo=aux.tile_lo, tile_hi=aux.tile_hi,
    )
    return dx, None


_gather_pallas_adj.defvjp(_gather_fwd, _gather_bwd)


def gather_rows(
    x: jnp.ndarray,
    aux: Optional[GatherAux],
    idx: Optional[jnp.ndarray] = None,
    min_edges_for_kernel: int = 16384,
) -> jnp.ndarray:
    """Row gather with an optional Pallas-adjoint path.

    ``idx`` is the fallback index array when ``aux`` is None.

    Measured on v5e at the 512x256 workload the custom-VJP path is a NET
    LOSS for end-to-end training (8.9 s vs 6.1 s per AR-4 step): the
    custom_vjp call boundary blocks XLA fusion around the forward gather,
    and the adjoint's extra permutation gather cancels the kernel's win
    over XLA's scatter.  Kept behind GCLT_FAST_GATHER_ADJ=1 for workloads
    where the trade-off differs; default is the plain take.
    """
    import os

    from .segment import use_pallas_segment_sum

    if (
        os.environ.get("GCLT_FAST_GATHER_ADJ") == "1"
        and aux is not None
        and x.shape[-1] % 128 == 0
        and aux.idx.shape[0] >= min_edges_for_kernel
        and use_pallas_segment_sum()
    ):
        return _gather_pallas_adj(x, aux)
    return jnp.take(x, aux.idx if aux is not None else idx, axis=0)
