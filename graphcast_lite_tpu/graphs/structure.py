"""Static padded graph structures shipped to the TPU.

Design: all graphs in this framework are *static* — built once on the host at
model-compile time (see ``graphcast_lite_tpu.graphs.build``) and padded to
fixed shapes so that every XLA trace sees constant shapes.  Dynamic behaviors
of the reference (SparseGAT edge pruning, region pruning) become *mask
updates* over a fixed edge superset instead of edge-list reallocation
(reference mutates ``self.processing_graph`` in place,
reference src/models.py:841-846 — here the pruned state is an explicit
``edge_mask`` array threaded functionally through the step).

Two edge layouts are carried:

* COO, sorted by receiver (``senders``/``receivers``/``edge_mask``): consumed
  by ``jax.ops.segment_sum``-based aggregation (the correctness oracle and
  general path).
* ELL (padded per-receiver neighbor table, ``neigh_senders``/``neigh_edge`` of
  shape [R, K]): consumed by the dense-gather TPU fast path and the Pallas
  kernels.  Built lazily only when the max degree makes it economical.

Node-index convention matches the reference (src/create_graphs.py:9-15):
one flat node array, grid nodes 0..N-1 then mesh nodes N..N+M-1; bipartite
graphs index into the combined space.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = ["Graph", "StepSched", "RegularBlocks", "pad_to_multiple",
           "build_graph", "build_regular_blocks"]

_LANE = 128  # pad edge counts to the TPU lane width


@struct.dataclass
class StepSched:
    """Device-side chunk schedule for the fused edge-step kernel
    (``ops.pallas_edge_step``): per-chunk DMA bases, (possibly negative =
    inert) receiver tiles, exactly-once ownership windows, receiver-window
    bases, and the per-chunk absolute receiver ids."""

    base: jnp.ndarray
    tile: jnp.ndarray
    lo: jnp.ndarray
    hi: jnp.ndarray
    rwin: jnp.ndarray
    recv: jnp.ndarray
    win_r: int = struct.field(pytree_node=False, default=512)
    xr_rows: int = struct.field(pytree_node=False, default=0)


def pad_to_multiple(n: int, m: int = _LANE) -> int:
    return ((n + m - 1) // m) * m


@struct.dataclass
class RegularBlocks:
    """Constant-degree per-level edge layout for icosahedral multimeshes.

    The icosphere is quasi-regular: within ONE subdivision level every
    vertex has exactly 6 neighbors (12 pentagon seeds: 5), and the
    multimesh's level-ℓ edges connect only the nested vertex PREFIX
    ids < V(ℓ) (reference src/mesh/create_mesh.py:25-223 nesting).  Each
    level therefore becomes a dense [V(ℓ), K≈6] receiver-major table:

      * aggregation = reshape-sum (adjoint: broadcast) — no segment
        reduction, no scatter;
      * the receiver-side feature rows broadcast for free (row r*K+k has
        receiver r) — no receiver gather;
      * only the sender gather remains.

    Rows are SLOT-MAJOR within a block (row = k·V + r, receiver r): every
    per-slot slice [V, F] is a clean 2-D tile — receiver broadcast is a
    k-fold tile and aggregation a k-term slice sum, with no 6-sublane 3-D
    shapes anywhere (measured: the [V, 6, F] receiver-major layout loses
    ~30% to sublane padding).  Blocks are concatenated (block b at static
    offset Σ_{b'<b} V_{b'}·K_{b'}) then lane-padded; padding rows carry
    mask 0 / sender 0.  The COO layout (sorted-by-receiver) remains the
    graph's public contract; this is an internal processor layout.
    """

    senders: jnp.ndarray              # [rows_pad] int32
    mask: jnp.ndarray                 # [rows_pad] float32
    edge_attr: Optional[jnp.ndarray]  # [rows_pad, F_e]
    # Sender-sorted permutation + clipped Pallas schedule for the backward
    # scatter (d_xs): the ONE adjoint the layout cannot turn into a
    # broadcast (receivers: slice-sum -> tile; senders: segment).
    s_perm: Optional[jnp.ndarray] = None      # [rows_pad] argsort(senders)
    s_sorted: Optional[jnp.ndarray] = None    # [rows_pad]
    s_chunk_base: Optional[jnp.ndarray] = None
    s_chunk_tile: Optional[jnp.ndarray] = None
    block_recv: tuple = struct.field(pytree_node=False, default=())
    block_k: tuple = struct.field(pytree_node=False, default=())
    s_tile_lo: int = struct.field(pytree_node=False, default=0)
    s_tile_hi: int = struct.field(pytree_node=False, default=0)
    num_nodes: int = struct.field(pytree_node=False, default=0)

    @property
    def rows_padded(self) -> int:
        return int(self.senders.shape[0])


def build_regular_blocks(
    senders: np.ndarray,
    receivers: np.ndarray,
    level_sizes,
    num_receivers: int,
    edge_attr: Optional[np.ndarray] = None,
    max_waste: float = 0.25,
    pad_multiple: int = _LANE,
    avoid_rows: int = -1,
) -> Optional[RegularBlocks]:
    """Per-level constant-degree tables, or None when the structure does
    not hold (pruned/regional meshes, exotic level sets).

    ``level_sizes``: ascending vertex-prefix sizes V(ℓ) of the multimesh
    levels.  An edge belongs to the smallest level with BOTH endpoints in
    its prefix (coarse vertices are never adjacent at finer levels)."""
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    e = senders.shape[0]
    if e == 0 or not level_sizes:
        return None
    sizes = sorted(int(v) for v in level_sizes)
    if sizes[-1] > num_receivers:
        return None
    both_max = np.maximum(senders, receivers)
    level_of = np.searchsorted(sizes, both_max, side="right")
    if (level_of >= len(sizes)).any():
        return None   # edges outside every level prefix

    snd_tabs, mask_tabs, attr_tabs = [], [], []
    block_recv, block_k = [], []
    total_rows = 0
    for li, v in enumerate(sizes):
        em = level_of == li
        if not em.any():
            return None
        r = receivers[em]
        s = senders[em]
        deg = np.bincount(r, minlength=v)
        k = int(deg.max())
        if k == 0 or v * k > (1.0 + max_waste) * em.sum():
            return None
        order = np.argsort(r, kind="stable")
        r_s, s_s = r[order], s[order]
        slot = np.arange(r_s.size) - np.concatenate(
            [[0], np.cumsum(deg)[:-1]]
        )[r_s]
        st = np.zeros((k, v), np.int32)
        mt = np.zeros((k, v), np.float32)
        st[slot, r_s] = s_s
        mt[slot, r_s] = 1.0
        snd_tabs.append(st.reshape(-1))
        mask_tabs.append(mt.reshape(-1))
        if edge_attr is not None:
            at = np.zeros((k, v, edge_attr.shape[1]), np.float32)
            at[slot, r_s] = edge_attr[em][order]
            attr_tabs.append(at.reshape(k * v, -1))
        block_recv.append(v)
        block_k.append(k)
        total_rows += v * k

    rows_pad = max(pad_to_multiple(total_rows, pad_multiple), pad_multiple)
    if rows_pad == avoid_rows:
        # The block-layout carrier is distinguished from the COO carrier by
        # its row count (models.gnn gates on it); keep them distinct.
        rows_pad += pad_multiple
    snd = np.zeros(rows_pad, np.int32)
    msk = np.zeros(rows_pad, np.float32)
    snd[:total_rows] = np.concatenate(snd_tabs)
    msk[:total_rows] = np.concatenate(mask_tabs)
    attr = None
    if edge_attr is not None:
        attr = np.zeros((rows_pad, edge_attr.shape[1]), np.float32)
        attr[:total_rows] = np.concatenate(attr_tabs, axis=0)

    # Sender-sorted aux for the backward scatter (masked rows carry exact
    # zero cotangents, so pad senders pointing at node 0 are harmless).
    from ..ops.pallas_segment import (
        DEFAULT_TILE_RECEIVERS, build_schedule_clipped,
    )

    s_perm = np.argsort(snd, kind="stable").astype(np.int32)
    s_sorted = snd[s_perm]
    s_base, s_tile, s_lo, s_hi = build_schedule_clipped(
        s_sorted, int(num_receivers), DEFAULT_TILE_RECEIVERS
    )
    return RegularBlocks(
        senders=jnp.asarray(snd),
        mask=jnp.asarray(msk),
        edge_attr=jnp.asarray(attr) if attr is not None else None,
        s_perm=jnp.asarray(s_perm),
        s_sorted=jnp.asarray(s_sorted),
        s_chunk_base=jnp.asarray(s_base),
        s_chunk_tile=jnp.asarray(s_tile),
        block_recv=tuple(block_recv),
        block_k=tuple(block_k),
        s_tile_lo=s_lo,
        s_tile_hi=s_hi,
        num_nodes=int(num_receivers),
    )


@struct.dataclass
class Graph:
    """A static padded message-passing graph.

    Attributes:
      senders: [E_pad] int32 sender node ids (padding slots point at node 0).
      receivers: [E_pad] int32 receiver node ids, sorted ascending; padding
        slots point at node ``num_nodes - 1`` to keep sortedness.
      edge_mask: [E_pad] float32, 1 for real edges, 0 for padding.  SparseGAT
        pruning produces updated copies of this array.
      edge_attr: optional [E_pad, F_e] float32 static edge features.
      neigh_senders: optional [R, K] int32 ELL table — sender id of each
        receiver's k-th incoming edge (self-padded with 0).
      neigh_edge: optional [R, K] int32 — index into the COO edge arrays for
        that slot (to pick up per-edge values such as attention or edge_attr);
        padding slots point at edge 0.
      neigh_mask: optional [R, K] float32 ELL validity mask.
      num_nodes: static — size of the (combined) node space.
      num_receivers: static — number of receiver rows for aggregation
        (== num_nodes for unified graphs).
      num_edges: static — number of real (unpadded) edges.
    """

    senders: jnp.ndarray
    receivers: jnp.ndarray
    edge_mask: jnp.ndarray
    edge_attr: Optional[jnp.ndarray] = None
    neigh_senders: Optional[jnp.ndarray] = None
    neigh_edge: Optional[jnp.ndarray] = None
    neigh_mask: Optional[jnp.ndarray] = None
    # Transpose ELL (per-SENDER outgoing-edge table, [N, K_out]): lets the
    # backward scatter d_agg -> senders run as a dense gather when the
    # out-degree is small and bounded (grid senders of the G2M encoder have
    # out-degree <= 3; multimesh nodes <= 12).  ``t_neigh_recv`` is the
    # receiver of each slot's edge, ``t_neigh_edge`` its COO edge id.
    t_neigh_recv: Optional[jnp.ndarray] = None
    t_neigh_edge: Optional[jnp.ndarray] = None
    t_neigh_mask: Optional[jnp.ndarray] = None
    # Pallas segment-sum chunk schedule (TE-aligned edge base + owning
    # receiver tile of each chunk); None disables the kernel path.  The
    # schedule is CLIPPED to the contiguous band of tiles that can own
    # edges ([seg_tile_lo, seg_tile_hi) — bipartite graphs concentrate
    # their receivers in one band; rows outside come back as exact zeros).
    # ``seg_recv`` is the kernel-facing receiver array: identical to
    # ``receivers`` except padding rows are repointed to the LAST REAL
    # receiver so they stay inside the band (the public ``receivers``
    # keeps the num_receivers-1 padding convention).
    seg_chunk_base: Optional[jnp.ndarray] = None
    seg_chunk_tile: Optional[jnp.ndarray] = None
    seg_recv: Optional[jnp.ndarray] = None
    # Fused edge-step kernel schedule (ops.pallas_edge_step); None
    # disables that kernel.
    step_sched: Optional[StepSched] = None
    # Fast-adjoint gather aux (sender-sorted permutations for the backward).
    senders_aux: Optional[object] = None
    receivers_aux: Optional[object] = None
    # Mask-static precomputes: the edge mask of a built graph only changes
    # under SparseGAT pruning (which passes an explicit runtime mask), so
    # the unmasked in-degree and the GCN symmetric normalizer are host
    # constants — consumers use them whenever no runtime mask overrides
    # the graph's own (saves one [E]-scalar segment-sum + two [E] gathers
    # per conv/step at runtime).
    static_in_degree: Optional[jnp.ndarray] = None   # [R] float32
    gcn_norm: Optional[jnp.ndarray] = None           # [E_pad] f32 dinv_s*dinv_r
    # Constant-degree per-level edge layout (icosahedral multimesh only;
    # see RegularBlocks) — the processor's segment-free fast path.
    reg_blocks: Optional[RegularBlocks] = None
    num_nodes: int = struct.field(pytree_node=False, default=0)
    num_receivers: int = struct.field(pytree_node=False, default=0)
    num_edges: int = struct.field(pytree_node=False, default=0)
    seg_tile_receivers: int = struct.field(pytree_node=False, default=0)
    seg_tile_lo: int = struct.field(pytree_node=False, default=0)
    seg_tile_hi: int = struct.field(pytree_node=False, default=0)
    # Constant-in-degree structure: every receiver in [0, num_const_receivers)
    # has exactly const_in_degree sorted consecutive edges and no padding
    # rows interleave (the M2G decoder: exactly 3 mesh senders per grid
    # node, reference src/create_graphs.py:244-295).  Aggregation then runs
    # as a dense reshape-sum instead of a segment reduction.
    const_in_degree: int = struct.field(pytree_node=False, default=0)
    num_const_receivers: int = struct.field(pytree_node=False, default=0)

    @property
    def padded_num_edges(self) -> int:
        return int(self.senders.shape[0])

    @property
    def has_ell(self) -> bool:
        return self.neigh_senders is not None


def build_graph(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    num_receivers: Optional[int] = None,
    edge_attr: Optional[np.ndarray] = None,
    build_ell: bool = True,
    max_ell_degree: int = 64,
    pad_multiple: int = _LANE,
    level_sizes=None,
) -> Graph:
    """Sort COO edges by receiver, pad, and (optionally) build the ELL table.

    Host-side NumPy; returns a `Graph` of jnp arrays.

    Args:
      senders/receivers: [E] integer edge endpoints (any order).
      num_nodes: size of the node space the ids index into.
      num_receivers: number of aggregation rows (defaults to num_nodes).
      edge_attr: optional [E, F_e] static edge features.
      build_ell: also build the padded per-receiver neighbor table when the
        max in-degree is <= max_ell_degree (otherwise padding waste explodes
        and the COO path is the better layout).
    """
    senders = np.asarray(senders, dtype=np.int64)
    receivers = np.asarray(receivers, dtype=np.int64)
    num_receivers = num_nodes if num_receivers is None else int(num_receivers)
    e = int(senders.shape[0])

    order = np.argsort(receivers, kind="stable")
    s_sorted = senders[order]
    r_sorted = receivers[order]
    attr_sorted = edge_attr[order] if edge_attr is not None else None

    e_pad = max(pad_to_multiple(e, pad_multiple), pad_multiple)
    s_full = np.zeros(e_pad, dtype=np.int32)
    r_full = np.full(e_pad, num_receivers - 1, dtype=np.int32)
    m_full = np.zeros(e_pad, dtype=np.float32)
    s_full[:e] = s_sorted
    r_full[:e] = r_sorted
    m_full[:e] = 1.0

    attr_full = None
    if attr_sorted is not None:
        attr_full = np.zeros((e_pad, attr_sorted.shape[1]), dtype=np.float32)
        attr_full[:e] = attr_sorted

    # Pallas segment-sum chunk schedule, clipped to the band of tiles real
    # edges can own (padding rows are repointed to the last real receiver
    # in the kernel-facing copy so they never widen the band).
    from ..ops.pallas_segment import (
        DEFAULT_TILE_RECEIVERS, build_schedule_clipped,
    )

    seg_recv = r_full
    if e > 0 and e < e_pad:
        seg_recv = r_full.copy()
        seg_recv[e:] = r_sorted[-1]
    seg_chunk_base, seg_chunk_tile, seg_tlo, seg_thi = build_schedule_clipped(
        seg_recv, num_receivers, DEFAULT_TILE_RECEIVERS
    )

    # Edge-step-kernel schedule: built only when the kernel is opted in
    # (GCLT_EDGE_STEP=1) — it is off by default (measured net loss
    # in-model, see ops/pallas_edge_step.py) and its [NC, TE] tables would
    # otherwise ride every jitted call as dead device arguments.
    step_sched = None
    import os as _os

    if _os.environ.get("GCLT_EDGE_STEP", "0") not in ("0", "false", "off"):
        from ..ops.pallas_edge_step import build_step_schedule

        ss = build_step_schedule(r_full, num_receivers,
                                 DEFAULT_TILE_RECEIVERS)
        if ss is not None:
            step_sched = StepSched(
                base=jnp.asarray(ss.base), tile=jnp.asarray(ss.tile),
                lo=jnp.asarray(ss.win_lo), hi=jnp.asarray(ss.win_hi),
                rwin=jnp.asarray(ss.rwin), recv=jnp.asarray(ss.recv),
                win_r=ss.win_r, xr_rows=ss.xr_rows,
            )

    neigh_senders = neigh_edge = neigh_mask = None
    if build_ell and e > 0:
        degrees = np.bincount(r_sorted, minlength=num_receivers)
        k_max = int(degrees.max())
        if k_max <= max_ell_degree:
            k = max(1, k_max)
            ns = np.zeros((num_receivers, k), dtype=np.int32)
            ne = np.zeros((num_receivers, k), dtype=np.int32)
            nm = np.zeros((num_receivers, k), dtype=np.float32)
            # slot position of each edge within its receiver's row
            slot = np.arange(e) - np.concatenate(
                [[0], np.cumsum(degrees)[:-1]]
            )[r_sorted]
            ns[r_sorted, slot] = s_sorted
            ne[r_sorted, slot] = np.arange(e, dtype=np.int32)
            nm[r_sorted, slot] = 1.0
            neigh_senders = jnp.asarray(ns)
            neigh_edge = jnp.asarray(ne)
            neigh_mask = jnp.asarray(nm)

    # Transpose ELL (outgoing edges per sender) for the backward scatter.
    t_neigh_recv = t_neigh_edge = t_neigh_mask = None
    if e > 0:
        out_deg = np.bincount(s_sorted, minlength=num_nodes)
        k_out = int(out_deg.max())
        if 0 < k_out <= max_ell_degree:
            order_s = np.argsort(s_sorted, kind="stable")
            ss = s_sorted[order_s]
            slot = np.arange(e) - np.concatenate(
                [[0], np.cumsum(out_deg)[:-1]]
            )[ss]
            tr = np.zeros((num_nodes, k_out), dtype=np.int32)
            te = np.zeros((num_nodes, k_out), dtype=np.int32)
            tm = np.zeros((num_nodes, k_out), dtype=np.float32)
            tr[ss, slot] = r_sorted[order_s]
            te[ss, slot] = order_s.astype(np.int32)
            tm[ss, slot] = 1.0
            t_neigh_recv = jnp.asarray(tr)
            t_neigh_edge = jnp.asarray(te)
            t_neigh_mask = jnp.asarray(tm)

    # Mask-static precomputes (see Graph docstring): unmasked in-degree and
    # the GCN symmetric normalizer with implicit self loops.
    degrees_f = np.bincount(
        r_sorted, minlength=num_receivers
    ).astype(np.float32) if e > 0 else np.zeros(num_receivers, np.float32)
    dinv = 1.0 / np.sqrt(degrees_f + 1.0)
    gcn_norm = np.zeros(e_pad, np.float32)
    if e > 0:
        # Sender normalizer looks up the RECEIVER-side degree array (PyG
        # gcn_norm semantics — unified node space asserted by GCNConv).
        dinv_nodes = np.zeros(num_nodes, np.float32)
        dinv_nodes[: min(num_receivers, num_nodes)] = dinv[
            : min(num_receivers, num_nodes)
        ]
        gcn_norm[:e] = dinv_nodes[s_sorted] * dinv[r_sorted]

    # Constant-degree structure (decoder M2G: k = 3 for every grid node).
    const_k, const_r = 0, 0
    if e > 0 and e == e_pad:
        nz = np.flatnonzero(degrees_f)
        if nz.size and nz[-1] == nz.size - 1:  # receivers 0..R0-1 contiguous
            k0 = int(degrees_f[0])
            if k0 > 0 and np.all(degrees_f[: nz.size] == k0) \
                    and k0 * nz.size == e:
                const_k, const_r = k0, int(nz.size)

    from ..ops.pallas_segment import DEFAULT_TILE_RECEIVERS as _TR
    from ..ops.gather import build_gather_aux

    # Sender gathers appear in every message-passing step; precompute the
    # sort-aux that lets their adjoint run through the Pallas kernel
    # (n_real clips the adjoint schedules to the real target band).
    senders_aux = build_gather_aux(s_full, int(num_nodes), n_real=e)
    receivers_aux = build_gather_aux(r_full, num_receivers, n_real=e)

    reg_blocks = None
    if level_sizes:
        reg_blocks = build_regular_blocks(
            senders, receivers, level_sizes, num_receivers,
            edge_attr=edge_attr, pad_multiple=pad_multiple,
            avoid_rows=e_pad,
        )

    return Graph(
        senders=jnp.asarray(s_full),
        receivers=jnp.asarray(r_full),
        edge_mask=jnp.asarray(m_full),
        edge_attr=jnp.asarray(attr_full) if attr_full is not None else None,
        neigh_senders=neigh_senders,
        neigh_edge=neigh_edge,
        neigh_mask=neigh_mask,
        t_neigh_recv=t_neigh_recv,
        t_neigh_edge=t_neigh_edge,
        t_neigh_mask=t_neigh_mask,
        seg_chunk_base=jnp.asarray(seg_chunk_base),
        seg_chunk_tile=jnp.asarray(seg_chunk_tile),
        seg_recv=jnp.asarray(seg_recv),
        seg_tile_lo=seg_tlo,
        seg_tile_hi=seg_thi,
        step_sched=step_sched,
        senders_aux=senders_aux,
        receivers_aux=receivers_aux,
        static_in_degree=jnp.asarray(degrees_f),
        reg_blocks=reg_blocks,
        gcn_norm=jnp.asarray(gcn_norm),
        num_nodes=int(num_nodes),
        num_receivers=num_receivers,
        num_edges=e,
        seg_tile_receivers=_TR,
        const_in_degree=const_k,
        num_const_receivers=const_r,
    )
