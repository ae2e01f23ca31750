"""Full-model SPMD: encode-process-decode + AR rollout loss + gradients,
all inside ONE ``jax.shard_map`` over a ``("data", "space")`` device mesh.

This is the integrated multi-chip training path (the reference has zero
distributed code — SURVEY §2.9; the design target is BASELINE.json's ≥80%
scaling efficiency).  Strategy:

* the grid and mesh node spaces are each partitioned into S latitude bands
  (``graphs.partition``); every shard owns a band of grid nodes, a band of
  mesh nodes, and the edges whose receivers it owns, for all THREE graphs
  (G2M encoding, E_M processing, M2G decoding);
* per graph, sender features cross shards either by gather-by-owner
  (one ``all_gather``) or by the banded plan (two ``ppermute`` boundary
  slabs + a compact hub ``all_gather`` for the multimesh's coarse levels);
  the cheaper plan is chosen per graph from exact host-side row accounting
  (``ShardingPlan.comm_stats``);
* the batch axis is data-parallel over the "data" mesh axis (vmapped
  locally inside the shard);
* the loss is computed as local numerator/denominator + ``psum``; gradients
  are ``jax.grad`` of the LOCAL numerator followed by one ``psum`` over both
  mesh axes — exactly ∂(global loss)/∂θ because the weighted-MSE denominator
  is parameter-free;
* the whole thing consumes the SAME parameter pytree as
  ``models.weather.WeatherModel`` — a model trained single-chip trains
  sharded unchanged (parity tested on the 8-device CPU mesh,
  tests/test_sharded_model.py).

Supported layer types (see ``ShardedWeatherForward._validate`` — the
authoritative gate): encoder/decoder = ConvGCN or GATConv stacks
(``_gat_stack_bipartite``); processor = InteractionNet / ConvGCN / GAT /
SparseGAT (``_gat_stack`` / ``_sparse_gat``, with per-shard edge-mask
pruning state).  Only product-graph models fall back to the GSPMD
auto-sharding path (``parallel.sharding``).  Measured S=1 512x256
GAT-encoder train step: shard_map 2513.7 ms (incl. the S=1-only forced
scan remat) vs GSPMD 2310.9 ms (``bench.py gat_sharded`` / ``gspmd``) —
at one chip GSPMD is the better dispatch for this family; the shard_map
body is what scales at S>=2, where the remat drops out and the edge work
splits spatially (a batch-1 GSPMD program cannot split its batch axis).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DataConfig, GraphLayerType, PipelineConfig
from ..graphs.build import GraphSet
from ..graphs.partition import (
    BandedHalos,
    NodePartition,
    ShardedGraph,
    build_banded_halos,
    build_node_partition,
    partition_nodes_by_latitude,
    shard_graph_bipartite,
)
from ..training.rollout import RolloutSpec, carry_forward

__all__ = [
    "ShardingPlan",
    "PlanArrays",
    "build_sharding_plan",
    "plan_device_arrays",
    "ShardedWeatherForward",
    "make_sharded_forward",
    "make_sharded_train_step",
    "make_sharded_eval_step",
    "predict_scaling_efficiency",
    "estimate_sharded_hbm",
]

_AXIS = "space"


# --------------------------------------------------------------------------
# Host-side plan
# --------------------------------------------------------------------------


@dataclasses.dataclass
class ShardingPlan:
    """Host-side partition of the full model's node/edge spaces."""

    num_shards: int
    grid_part: NodePartition
    mesh_part: NodePartition
    enc: ShardedGraph
    proc: ShardedGraph
    dec: ShardedGraph
    enc_halos: Optional[object]   # BandedHalos | TiledHalos | None
    proc_halos: Optional[object]
    dec_halos: Optional[object]
    comm_stats: Dict[str, Dict[str, int]]
    partition: str = "lat"        # "lat" (1-D bands) | "tiles" (2-D)

    def scatter_grid(self, x: np.ndarray) -> np.ndarray:
        """[..., G, F] -> [..., S, G_s, F]."""
        return self.grid_part.scatter(x)

    def gather_grid(self, x_sh) -> np.ndarray:
        return self.grid_part.gather(np.asarray(x_sh))


# Per-node forward-compute weight of a mesh node relative to a grid node
# (the 12-step InteractionNet dominates: measured ~57 ms over 41K mesh nodes
# vs ~33 ms over 172K grid+mesh rows at 512x256 => ~7x).  Used to balance
# WORK, not node counts, when choosing shared 2-D tile boundaries.
MESH_NODE_WEIGHT = 7.0


def build_sharding_plan(
    gs: GraphSet,
    num_shards: int,
    halo_mode: str = "auto",
    pad_edges_multiple: int = 128,
    partition: str = "auto",
) -> ShardingPlan:
    """Partition grid+mesh and shard all three graphs.

    ``partition``: "lat" — independent 1-D latitude bands per node space;
    "tiles" — 2-D lat×lon tiles with SHARED boundaries balancing combined
    work (fixes the bipartite-halo blowup at S≥16: misaligned per-space
    bands make G2M/M2G edges span many sender bands); "auto" — build both
    and keep the one moving fewer total rows/step.
    ``halo_mode``: "auto" picks gather vs banded/tiled per graph from the
    exact rows-exchanged accounting; "banded"/"gather" force one plan.
    """
    if partition == "auto":
        lat_plan = build_sharding_plan(gs, num_shards, halo_mode,
                                       pad_edges_multiple, "lat")
        if num_shards < 4:
            return lat_plan          # tiles degenerate to bands
        tile_plan = build_sharding_plan(gs, num_shards, halo_mode,
                                        pad_edges_multiple, "tiles")

        def total(plan):
            return sum(
                min(st["banded"], st["all_gather_baseline"])
                for st in plan.comm_stats.values()
            )

        return tile_plan if total(tile_plan) < total(lat_plan) else lat_plan

    if partition == "tiles":
        from ..graphs.partition import (
            TileShape, build_tiled_halos, partition_nodes_by_tiles,
            tile_boundaries,
        )

        shape = TileShape.factor(num_shards)
        all_lats = np.concatenate([gs.grid_lat, gs.mesh_lat])
        all_lons = np.concatenate([gs.grid_lon, gs.mesh_lon])
        weights = np.concatenate([
            np.ones(gs.num_grid_nodes, np.float64),
            np.full(gs.num_mesh_nodes, MESH_NODE_WEIGHT, np.float64),
        ])
        lat_e, lon_e = tile_boundaries(all_lats, all_lons, weights, shape)
        grid_shard = partition_nodes_by_tiles(
            gs.grid_lat, gs.grid_lon, lat_e, lon_e, shape
        )
        mesh_shard = partition_nodes_by_tiles(
            gs.mesh_lat, gs.mesh_lon, lat_e, lon_e, shape
        )
        grid_part = build_node_partition(grid_shard, num_shards)
        mesh_part = build_node_partition(mesh_shard, num_shards)

        def make_halos(sg):
            return build_tiled_halos(sg, shape)
    else:
        grid_part = build_node_partition(
            partition_nodes_by_latitude(gs.grid_lat, num_shards), num_shards
        )
        mesh_part = build_node_partition(
            partition_nodes_by_latitude(gs.mesh_lat, num_shards), num_shards
        )
        make_halos = build_banded_halos

    n_grid = gs.num_grid_nodes
    enc = shard_graph_bipartite(
        gs.encoding, grid_part, mesh_part, 0, n_grid, pad_edges_multiple
    )
    proc = shard_graph_bipartite(
        gs.processing, mesh_part, mesh_part, 0, 0, pad_edges_multiple
    )
    dec = shard_graph_bipartite(
        gs.decoding, mesh_part, grid_part, n_grid, 0, pad_edges_multiple
    )

    halos = {}
    stats = {}
    for name, sg in (("enc", enc), ("proc", proc), ("dec", dec)):
        h = make_halos(sg)
        acct = h.rows_exchanged_per_step(sg)
        if halo_mode == "banded":
            use = True
        elif halo_mode == "gather":
            use = False
        else:  # auto: halo plan only when it moves strictly fewer rows
            use = acct["banded"] < acct["all_gather_baseline"]
        acct["chosen"] = (
            ("tiled" if partition == "tiles" else "banded") if use
            else "gather"
        )
        halos[name] = h if use else None
        stats[name] = acct

    return ShardingPlan(
        num_shards=num_shards,
        grid_part=grid_part,
        mesh_part=mesh_part,
        enc=enc,
        proc=proc,
        dec=dec,
        enc_halos=halos["enc"],
        proc_halos=halos["proc"],
        dec_halos=halos["dec"],
        comm_stats=stats,
        partition=partition,
    )


def predict_scaling_efficiency(
    plan: ShardingPlan,
    t1_step_ms: float,
    hidden: int = 256,
    ar_steps: int = 4,
    mp_steps: int = 12,
    ici_gbps: float = 45.0,
    dtype_bytes: int = 2,
    overhead_frac: Optional[float] = None,
) -> Dict[str, float]:
    """Analytic worst-case (zero-overlap) scaling-efficiency estimate.

    The north-star metric (BASELINE.json) is grid-points/s scaling
    efficiency at S chips vs 1.  Model:

      compute_ms  = t1_step_ms / S          (work splits evenly: the node
                                             partitions are count-balanced)
      comm_ms     = Σ_graph  exchanges × rows/exchange × hidden × b / ICI
      efficiency  = compute / (compute + comm) / (1 + overhead_frac)

    ``overhead_frac`` is the MEASURED sharded-body overhead vs the
    unsharded step (shard_map machinery, halo indexing, per-shard kernel
    differences), from bench.py's S=1 run — folding it in gives the
    composite worst-case number instead of the best-case comm-only corner
    (VERDICT r3 missing #1).  When None, only the comm model applies.

    Exchange counts per train step: the processor halo runs every MP step,
    fwd + its transpose in bwd (the outer AR remat replays fwd once more):
    3 × mp × ar; encoder/decoder halos run once per model call: 3 × ar.
    ``rows`` below are already whole-mesh totals per exchange
    (``BandedHalos.rows_exchanged_per_step``), and ICI here is per-link
    bandwidth with all S links active concurrently on a ring — so per-link
    bytes = total_bytes / S for both ppermute (each link carries its slab)
    and bidirectional-ring all_gather.

    This is deliberately pessimistic: no compute/comm overlap, remat replay
    counted, reality should land at or above the returned numbers.  Real
    multi-chip wall-clock measurement supersedes this when hardware is
    available (the driver environment exposes one chip).
    """
    s = plan.num_shards
    if s <= 1:
        return {"S": 1, "efficiency": 1.0, "compute_ms": t1_step_ms,
                "comm_ms": 0.0}
    per_exchange_rows = {
        name: min(st["banded"], st["all_gather_baseline"])
        for name, st in plan.comm_stats.items()
    }
    exchanges = {
        "enc": 3 * ar_steps,
        "dec": 3 * ar_steps,
        "proc": 3 * ar_steps * mp_steps,
    }
    total_bytes = sum(
        per_exchange_rows[g] * exchanges[g] * hidden * dtype_bytes
        for g in ("enc", "proc", "dec")
    )
    comm_ms = total_bytes / s / (ici_gbps * 1e9) * 1e3
    compute_ms = t1_step_ms / s
    eff = compute_ms / (compute_ms + comm_ms)
    out = {
        "S": s,
        "efficiency": round(eff, 4),
        "compute_ms": round(compute_ms, 2),
        "comm_ms": round(comm_ms, 2),
        "comm_bytes_per_step": int(total_bytes),
    }
    if overhead_frac is not None:
        out["overhead_frac"] = round(float(overhead_frac), 4)
        out["efficiency_composite"] = round(eff / (1.0 + overhead_frac), 4)
    return out


def estimate_sharded_hbm(
    plan: ShardingPlan,
    hidden: int = 256,
    mp_steps: int = 12,
    ar_steps: int = 4,
    num_params: int = 5_950_000,
    obs_window: int = 2,
    num_features: int = 19,
    compute_bytes: int = 2,
    scan_remat: bool = False,
) -> Dict[str, float]:
    """Per-shard HBM accounting of the sharded train-step body (bytes).

    Purpose (VERDICT r4 task 5): the composite scaling-efficiency numbers
    assume the S>=2 body runs WITHOUT the processor-scan remat that S=1
    needs; this arithmetic bounds the remat-free per-shard footprint so
    that assumption is checkable without multi-chip hardware.

    Model, per shard (bf16 compute, fp32 master params + Adam):

      params      = P · (4 master + 8 adam + 2 cast)            [replicated]
      edges       = Σ_graph E_s · (4 snd + 4 rcv + 2 mask) + proc attr/mask
      BPTT saves  = ar · mp · (k_e·E_s^proc + k_n·M_s) · h · b
                    (k_e=2: edge-MLP pre-activation + updated edge carry;
                     k_n=3: aggregate, node pre-activation, node carry —
                     the scan's per-step stacked residuals, remat-free)
      enc/dec     = ar · k_ed · (G_s + M_s) · h · b  (save-h_pre default:
                    per-AR-step boundary latents kept; blocks rematted)
      state       = AR window + targets + grid outputs

    CALIBRATION: at S=1 this model must reproduce the MEASURED remat-free
    OOM request (19.7 GB at 512x256/[4,6]/h256/mp12/AR4, bench r4) —
    asserted by tests/test_sharded_model.py; with ``scan_remat=True`` the
    BPTT term drops to the per-step live set (carry only), which is the
    S=1 default configuration that fits.
    """
    s = plan.num_shards
    h, b = hidden, compute_bytes
    g_s = plan.grid_part.nodes_per_shard
    m_s = plan.mesh_part.nodes_per_shard
    e_proc = plan.proc.senders_global.shape[1]
    e_enc = plan.enc.senders_global.shape[1]
    e_dec = plan.dec.senders_global.shape[1]

    params_b = num_params * (4 + 8 + 2)
    edges_b = (
        (e_proc + e_enc + e_dec) * 10
        + e_proc * (4 * 4 + 4)          # 4-feature f32 edge attr + f32 mask
    )
    k_e, k_n, k_ed = 2.0, 3.0, 4.0
    if scan_remat:
        # Scan remat: only ONE step's intermediates live at a time, plus
        # the stacked per-step carries the scan must keep for replay.
        bptt_b = ar_steps * (
            (k_e * e_proc + k_n * m_s) * h * b          # one live step
            + mp_steps * (e_proc + m_s) * h * b         # stacked carries
        )
    else:
        bptt_b = ar_steps * mp_steps * (k_e * e_proc + k_n * m_s) * h * b
    encdec_b = ar_steps * k_ed * (g_s + m_s) * h * b
    state_b = g_s * (obs_window + 2 * ar_steps) * num_features * 4

    total = params_b + edges_b + bptt_b + encdec_b + state_b
    return {
        "S": s,
        "params_gb": params_b / 1e9,
        "edges_gb": edges_b / 1e9,
        "bptt_gb": bptt_b / 1e9,
        "encdec_gb": encdec_b / 1e9,
        "state_gb": state_b / 1e9,
        "total_gb": total / 1e9,
    }


# --------------------------------------------------------------------------
# Device-side arrays (pytree shipped as a jit ARGUMENT — never a closure;
# closure constants are fetched back through the axon tunnel at lowering)
# --------------------------------------------------------------------------


@struct.dataclass
class GraphArrays:
    """One sharded graph's device arrays ([S, ...] leading shard axis)."""

    senders: jnp.ndarray        # [S, E] ext-table ids (banded) | global slots
    receivers: jnp.ndarray      # [S, E] local receiver row ids
    edge_mask: jnp.ndarray      # [S, E]
    edge_attr: Optional[jnp.ndarray] = None    # [S, E, F_e]
    send_up: Optional[jnp.ndarray] = None      # [S, H] (banded 1-D)
    send_down: Optional[jnp.ndarray] = None    # [S, H]
    tile_send: Optional[jnp.ndarray] = None    # [S, D, H] (tiled 2-D)
    hub: Optional[jnp.ndarray] = None          # [S, Hh]
    # Per-shard Pallas sorted-segment schedules (kernel-faithful sharded
    # compute: the same one-hot-MXU segment kernel + fused edge unit the
    # single-chip path uses; padded to equal shapes across shards).
    r_chunk_base: Optional[jnp.ndarray] = None   # [S, NC_r]
    r_chunk_tile: Optional[jnp.ndarray] = None
    s_perm: Optional[jnp.ndarray] = None         # [S, E] argsort(senders)
    s_sorted: Optional[jnp.ndarray] = None       # [S, E]
    s_chunk_base: Optional[jnp.ndarray] = None   # [S, NC_s]
    s_chunk_tile: Optional[jnp.ndarray] = None
    # Host-precomputed in-degree under the STATIC edge mask ([S, R_s] f32)
    # — the sharded mirror of Graph.static_in_degree; consumers fall back
    # to a runtime segment-sum only under a pruned (SparseGAT) mask.
    static_in_degree: Optional[jnp.ndarray] = None
    banded: bool = struct.field(pytree_node=False, default=False)
    # 2-D tile topology (halo mode "tiled"): static direction list + shape.
    tile_shape: Optional[Tuple[int, int]] = struct.field(
        pytree_node=False, default=None
    )
    tile_dirs: Optional[Tuple[Tuple[int, int], ...]] = struct.field(
        pytree_node=False, default=None
    )
    num_recv: int = struct.field(pytree_node=False, default=0)
    num_sender_rows: int = struct.field(pytree_node=False, default=0)
    tile_receivers: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class PlanArrays:
    """Everything static the sharded model needs, per shard."""

    enc: GraphArrays
    proc: GraphArrays
    dec: GraphArrays
    grid_static: jnp.ndarray   # [S, G_s, 6]
    mesh_static: jnp.ndarray   # [S, M_s, 6]
    grid_mask: jnp.ndarray     # [S, G_s] 1 for real grid rows
    loss_weight: jnp.ndarray   # [S, G_s] node_mask × lat × spatial
    num_shards: int = struct.field(pytree_node=False, default=1)


def _pad_schedules(scheds, dummy_base: int, last_tile: int):
    """Pad per-shard (base, tile) chunk lists to one [S, NC] shape.  Padding
    chunks are inert: base 0 with a NEGATIVE tile id (-ntiles decodes to the
    last tile, which every schedule ends on, so the revisit is consecutive
    and accumulates exact zeros without re-initializing any tile)."""
    nc = max(b.shape[0] for b, _ in scheds)
    bases = np.full((len(scheds), nc), dummy_base, np.int32)
    tiles = np.full((len(scheds), nc), last_tile, np.int32)
    for s, (b, t) in enumerate(scheds):
        bases[s, : b.shape[0]] = b
        tiles[s, : t.shape[0]] = t
    return bases, tiles


def _graph_arrays(sg: ShardedGraph, halos) -> GraphArrays:
    from ..graphs.partition import TiledHalos
    from ..ops.pallas_segment import (
        DEFAULT_TILE_RECEIVERS, TILE_EDGES, build_schedule,
    )

    tiled = isinstance(halos, TiledHalos)
    senders = (halos.senders_ext if halos is not None
               else sg.senders_global)
    if halos is None:
        n_sender_rows = sg.num_shards * sg.sender_block
    elif tiled:
        n_sender_rows = (
            sg.sender_block + len(halos.dirs) * halos.slab_size
            + sg.num_shards * halos.hub_size
        )
    else:
        n_sender_rows = (
            sg.sender_block + 2 * halos.slab_size
            + sg.num_shards * halos.hub_size
        )
    s_n, e = senders.shape
    n_s = sg.nodes_per_shard
    ntiles_r = (n_s + DEFAULT_TILE_RECEIVERS - 1) // DEFAULT_TILE_RECEIVERS
    ntiles_s = ((n_sender_rows + DEFAULT_TILE_RECEIVERS - 1)
                // DEFAULT_TILE_RECEIVERS)

    r_scheds, s_scheds = [], []
    s_perm = np.zeros((s_n, e), np.int32)
    s_sorted = np.zeros((s_n, e), np.int32)
    for s in range(s_n):
        r_scheds.append(build_schedule(np.asarray(sg.receivers_local[s]),
                                       n_s, DEFAULT_TILE_RECEIVERS))
        perm = np.argsort(np.asarray(senders[s]), kind="stable").astype(
            np.int32
        )
        s_perm[s] = perm
        s_sorted[s] = np.asarray(senders[s])[perm]
        s_scheds.append(build_schedule(s_sorted[s], n_sender_rows,
                                       DEFAULT_TILE_RECEIVERS))
    # Schedule padding to a common per-shard length: inert chunks encoded
    # as (base 0, NEGATIVE tile id) — the kernel decodes the block index
    # and suppresses the one-hot (ops.pallas_segment convention).
    r_base, r_tile = _pad_schedules(r_scheds, 0, -ntiles_r)
    s_base, s_tile = _pad_schedules(s_scheds, 0, -ntiles_s)

    deg = np.zeros((s_n, n_s), np.float32)
    for s in range(s_n):
        np.add.at(deg[s], np.asarray(sg.receivers_local[s]),
                  np.asarray(sg.edge_mask[s], np.float32))

    return GraphArrays(
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(sg.receivers_local),
        edge_mask=jnp.asarray(sg.edge_mask),
        edge_attr=(jnp.asarray(sg.edge_attr)
                   if sg.edge_attr is not None else None),
        send_up=(jnp.asarray(halos.send_up)
                 if halos is not None and not tiled else None),
        send_down=(jnp.asarray(halos.send_down)
                   if halos is not None and not tiled else None),
        tile_send=jnp.asarray(halos.send_idx) if tiled else None,
        hub=jnp.asarray(halos.hub_idx) if halos is not None else None,
        r_chunk_base=jnp.asarray(r_base),
        r_chunk_tile=jnp.asarray(r_tile),
        s_perm=jnp.asarray(s_perm),
        s_sorted=jnp.asarray(s_sorted),
        s_chunk_base=jnp.asarray(s_base),
        s_chunk_tile=jnp.asarray(s_tile),
        static_in_degree=jnp.asarray(deg),
        banded=halos is not None,
        tile_shape=((halos.shape.s_lat, halos.shape.s_lon) if tiled
                    else None),
        tile_dirs=halos.dirs if tiled else None,
        num_recv=sg.nodes_per_shard,
        num_sender_rows=n_sender_rows,
        tile_receivers=DEFAULT_TILE_RECEIVERS,
    )


def plan_device_arrays(
    plan: ShardingPlan,
    gs: GraphSet,
    lat_weights: Optional[np.ndarray] = None,
    spatial_mask: Optional[np.ndarray] = None,
) -> PlanArrays:
    """Assemble the PlanArrays pytree (host -> jnp)."""
    w = plan.grid_part.node_mask.copy()
    if lat_weights is not None:
        w = w * plan.grid_part.scatter(
            np.asarray(lat_weights, np.float32)[:, None]
        )[..., 0]
    if spatial_mask is not None:
        w = w * plan.grid_part.scatter(
            np.asarray(spatial_mask, np.float32)[:, None]
        )[..., 0]
    return PlanArrays(
        enc=_graph_arrays(plan.enc, plan.enc_halos),
        proc=_graph_arrays(plan.proc, plan.proc_halos),
        dec=_graph_arrays(plan.dec, plan.dec_halos),
        grid_static=jnp.asarray(plan.grid_part.scatter(gs.grid_static)),
        mesh_static=jnp.asarray(plan.mesh_part.scatter(gs.mesh_static)),
        grid_mask=jnp.asarray(plan.grid_part.node_mask),
        loss_weight=jnp.asarray(w),
        num_shards=plan.num_shards,
    )


# --------------------------------------------------------------------------
# Per-shard layer math (runs INSIDE shard_map; mirrors models/nn.py +
# models/gnn.py numerics exactly — see tests/test_sharded_model.py)
# --------------------------------------------------------------------------


def _prelu(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def _node_ln(x, p, eps=1e-5):
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * p["weight"] + p["bias"]


def _graph_ln_psum(x, p, mask, eps=1e-5):
    """PyG graph-mode LayerNorm with psum'd masked statistics over space.
    Statistics in f32 (the mask weights are f32); result cast back to the
    compute dtype so bf16 scan carries keep their type."""
    w = mask[:, None]
    c = x.shape[-1]
    total_sum = jax.lax.psum((x * w).sum(), _AXIS)
    total_cnt = jnp.maximum(jax.lax.psum(w.sum() * c, _AXIS), 1.0)
    mean = total_sum / total_cnt
    var = jax.lax.psum((jnp.square(x - mean) * w).sum(), _AXIS) / total_cnt
    out = (x - mean) / jnp.sqrt(var + eps) * p["weight"] + p["bias"]
    return out.astype(x.dtype)


def _mlp_tower(p, x):
    """MLPTower (models/nn.py:148-170): lin_i -> prelu_i ... -> node LN."""
    n_lin = sum(1 for k in p if str(k).startswith("lin_"))
    for i in range(n_lin):
        lp = p[f"lin_{i}"]
        x = x @ lp["kernel"] + lp["bias"]
        if f"prelu_{i}" in p:
            x = _prelu(x, p[f"prelu_{i}"]["alpha"])
    if "norm" in p:
        x = _node_ln(x, p["norm"])
    return x


def _use_sharded_kernels(ga: GraphArrays, features: int) -> bool:
    """Kernel-faithful per-shard compute: the same Pallas sorted-segment
    kernel + fused edge unit the single-chip path uses.  Same conditions as
    the single-chip policy (per-shard edge count, lane-aligned features,
    TPU backend); override with GCLT_SHARDED_KERNELS=0/1."""
    import os

    from ..ops.segment import use_pallas_segment_sum

    flag = os.environ.get("GCLT_SHARDED_KERNELS")
    if flag is not None:
        enabled = flag not in ("0", "false", "off")
    else:
        enabled = (
            int(ga.senders.shape[-1]) >= 16384 and use_pallas_segment_sum()
        )
    return (
        enabled
        and ga.r_chunk_base is not None
        and features % 128 == 0
    )


def _check_vma() -> bool:
    """shard_map VMA checking policy: ``pallas_call`` outputs carry no VMA
    annotation on real TPU backends, so the check must be OFF wherever the
    per-shard kernel path can engage (it would reject correct programs).
    Keep it ON for pure-XLA builds (CPU runs without GCLT_SHARDED_KERNELS=1)
    so mis-specced collectives surface as trace-time errors, not numerics."""
    import os

    from ..ops.segment import use_pallas_segment_sum

    flag = os.environ.get("GCLT_SHARDED_KERNELS")
    if flag is not None:
        return flag in ("0", "false", "off")
    return not use_pallas_segment_sum()


def _halo_rows(rows: jnp.ndarray, ga: GraphArrays, num_shards: int):
    """Extended sender table: local rows + exchanged remote rows.

    Gather mode: one tiled all_gather (ids are global slots).
    Banded mode: two ppermute boundary slabs + hub all_gather (ids are
    ext-table offsets) — see graphs.partition.BandedHalos.
    Tiled mode: one ppermute slab per 2-D tile direction + hub all_gather —
    see graphs.partition.TiledHalos.
    """
    if not ga.banded:
        return jax.lax.all_gather(rows, _AXIS, tiled=True)
    if ga.tile_dirs is not None:
        from ..graphs.partition import TileShape, _tile_pairs

        shape = TileShape(*ga.tile_shape)
        slabs = []
        for i, d in enumerate(ga.tile_dirs):
            perm = _tile_pairs(shape, d)
            slabs.append(jax.lax.ppermute(
                jnp.take(rows, ga.tile_send[i], axis=0), _AXIS, perm
            ))
        hub_all = jax.lax.all_gather(
            jnp.take(rows, ga.hub, axis=0), _AXIS, tiled=True
        )
        return jnp.concatenate([rows] + slabs + [hub_all], axis=0)
    up_perm = [(i, i + 1) for i in range(num_shards - 1)]
    down_perm = [(i, i - 1) for i in range(1, num_shards)]
    from_down = jax.lax.ppermute(
        jnp.take(rows, ga.send_up, axis=0), _AXIS, up_perm
    )
    from_up = jax.lax.ppermute(
        jnp.take(rows, ga.send_down, axis=0), _AXIS, down_perm
    )
    hub_all = jax.lax.all_gather(
        jnp.take(rows, ga.hub, axis=0), _AXIS, tiled=True
    )
    return jnp.concatenate([rows, from_down, from_up, hub_all], axis=0)


def _gcn_layer(
    conv_p, x_send, x_recv, ga: GraphArrays, num_shards: int, bipartite: bool
):
    """PyG-parity GCNConv (models/gnn.py:65-111) on a sharded graph.

    Bipartite graphs (G2M / M2G): senders have in-degree 0 in the unified
    node space, so their symmetric-norm factor is 1 and their own output is
    the pure self-loop term xW + b.  Unified graphs: senders scale their
    projections by their local dinv before the halo exchange.
    Returns (out_send, out_recv).
    """
    k, b = conv_p["kernel"], conv_p["bias"]
    xw_r = x_recv @ k
    if ga.static_in_degree is not None:
        deg = ga.static_in_degree.astype(jnp.float32) + 1.0
    else:
        deg = jax.ops.segment_sum(
            ga.edge_mask, ga.receivers, num_segments=ga.num_recv
        ) + 1.0
    dinv = jax.lax.rsqrt(deg).astype(xw_r.dtype)
    if bipartite:
        xw_s = x_send @ k
        scaled = xw_s
    else:
        xw_s = xw_r
        scaled = xw_s * dinv[:, None]
    ext = _halo_rows(scaled, ga, num_shards)
    if _use_sharded_kernels(ga, int(xw_r.shape[-1])):
        from ..ops.gcn_agg import _Static as _GcnStatic, _gcn_agg

        static = _GcnStatic(
            num_nodes=ga.num_sender_rows, num_receivers=ga.num_recv,
            tile_receivers=ga.tile_receivers, bwd_mode="pallas",
            interpret=jax.default_backend() == "cpu",
        )
        dummy_t = jnp.zeros((1, 1), jnp.int32)
        agg = _gcn_agg(
            static, ext, ga.edge_mask.astype(xw_r.dtype), ga.senders,
            ga.receivers, ga.r_chunk_base, ga.r_chunk_tile,
            ga.s_perm, ga.s_sorted, ga.s_chunk_base, ga.s_chunk_tile,
            dummy_t, dummy_t, jnp.zeros((1, 1), xw_r.dtype),
        )
    else:
        msgs = jnp.take(ext, ga.senders, axis=0) * ga.edge_mask[
            :, None
        ].astype(xw_r.dtype)
        agg = jax.ops.segment_sum(
            msgs, ga.receivers, num_segments=ga.num_recv
        )
    out_r = agg * dinv[:, None] + xw_r * jnp.square(dinv)[:, None] + b
    out_s = (xw_s + b) if bipartite else out_r
    return out_s, out_r


def _gcn_stack(
    gl_p, cfg, x_send, x_recv, ga: GraphArrays, num_shards: int,
    bipartite: bool,
):
    """GraphLayerModule's ConvGCN branch (models/weather.py:137-161)."""
    hidden = list(cfg.hidden_dims or [])
    n_layers = len(hidden) + 1
    act_name = (cfg.activation or "prelu").lower()
    for i in range(n_layers):
        x_send, x_recv = _gcn_layer(
            gl_p[f"conv_{i}"], x_send, x_recv, ga, num_shards, bipartite
        )
        if i < n_layers - 1:
            if act_name == "prelu":
                alpha = gl_p["act"]["alpha"]
                x_send = _prelu(x_send, alpha)
                x_recv = _prelu(x_recv, alpha)
            else:
                fn = jax.nn.silu if act_name in ("swish", "silu") else jax.nn.relu
                x_send, x_recv = fn(x_send), fn(x_recv)
    if cfg.use_layer_norm:
        x_send = _node_ln(x_send, gl_p["norm"])
        x_recv = _node_ln(x_recv, gl_p["norm"])
    return x_send, x_recv


def _gat_core(core_p, x, ga: GraphArrays, num_shards: int, heads: int,
              edge_mask):
    """PyG-parity GATConv(concat=False) core (models/gnn.py:114-180) on a
    sharded unified graph.  Receivers own their incoming edges, so the
    masked softmax (incl. the implicit self loop) is receiver-LOCAL; only
    the sender projections xp and their attention terms cross shards (one
    packed halo exchange).  Returns (out [N_s, C], alpha [E])."""
    kernel = core_p["kernel"]
    att_src, att_dst = core_p["att_src"], core_p["att_dst"]
    n, hc = x.shape[0], kernel.shape[1]
    c = hc // heads
    xp = (x @ kernel).reshape(n, heads, c)
    a_src = (xp * att_src).sum(-1)            # [N_s, H]
    a_dst = (xp * att_dst).sum(-1)

    packed = jnp.concatenate([xp.reshape(n, hc), a_src], axis=-1)
    ext = _halo_rows(packed, ga, num_shards)
    xp_ext = ext[:, :hc].reshape(-1, heads, c)
    a_src_ext = ext[:, hc:]

    logits = (jnp.take(a_src_ext, ga.senders, axis=0)
              + jnp.take(a_dst, ga.receivers, axis=0))
    logits = jax.nn.leaky_relu(logits, 0.2)
    self_logits = jax.nn.leaky_relu(a_src + a_dst, 0.2)

    m = edge_mask[:, None]
    neg = jnp.asarray(-1e30, logits.dtype)
    ml = jnp.where(m > 0, logits, neg)
    seg_max = jax.ops.segment_max(
        ml, ga.receivers, num_segments=ga.num_recv, indices_are_sorted=True
    )
    seg_max = jnp.maximum(jnp.maximum(seg_max, self_logits), neg)
    seg_max = jax.lax.stop_gradient(seg_max)
    shifted = jnp.exp(ml - jnp.take(seg_max, ga.receivers, axis=0)) * m
    denom = jax.ops.segment_sum(
        shifted, ga.receivers, num_segments=ga.num_recv,
        indices_are_sorted=True,
    )
    self_exp = jnp.exp(self_logits - seg_max)
    denom = jnp.maximum(denom + self_exp, 1e-16)
    w = shifted / jnp.take(denom, ga.receivers, axis=0)        # [E, H]
    self_w = self_exp / denom

    msgs = jnp.take(xp_ext, ga.senders, axis=0) * w[..., None]
    out = jax.ops.segment_sum(
        msgs * m[..., None], ga.receivers, num_segments=ga.num_recv,
        indices_are_sorted=True,
    )
    out = (out + xp * self_w[..., None]).mean(axis=1)
    if "bias" in core_p:
        out = out + core_p["bias"]
    alpha = w.mean(axis=-1) * edge_mask
    return out, alpha


def _gat_core_bipartite(core_p, x_send, x_recv, ga: GraphArrays,
                        num_shards: int, heads: int, edge_mask):
    """GATConv on a sharded BIPARTITE graph (G2M / M2G enc/dec stacks).

    Unified-space semantics preserved (models/gnn.py:129-195): receivers
    softmax over their incoming edges PLUS the implicit self loop; sender-
    side rows have no incoming edges, so their softmax collapses to the
    self loop and their output is the pure projection xp (mean over heads)
    + bias — exactly the single-device model's value for those rows.
    Only the sender projections + their attention terms cross shards (one
    packed halo exchange, like the GCN stack's).  Returns
    (out_send, out_recv)."""
    kernel = core_p["kernel"]
    att_src, att_dst = core_p["att_src"], core_p["att_dst"]
    ns, hc = x_send.shape[0], kernel.shape[1]
    nr = x_recv.shape[0]
    c = hc // heads
    xp_s = (x_send @ kernel).reshape(ns, heads, c)
    xp_r = (x_recv @ kernel).reshape(nr, heads, c)
    a_src_s = (xp_s * att_src).sum(-1)        # [Ns, H]
    a_src_r = (xp_r * att_src).sum(-1)        # receiver self-loop src term
    a_dst_r = (xp_r * att_dst).sum(-1)

    packed = jnp.concatenate([xp_s.reshape(ns, hc), a_src_s], axis=-1)
    ext = _halo_rows(packed, ga, num_shards)
    xp_ext = ext[:, :hc].reshape(-1, heads, c)
    a_src_ext = ext[:, hc:]

    logits = (jnp.take(a_src_ext, ga.senders, axis=0)
              + jnp.take(a_dst_r, ga.receivers, axis=0))
    logits = jax.nn.leaky_relu(logits, 0.2)
    self_logits = jax.nn.leaky_relu(a_src_r + a_dst_r, 0.2)

    m = edge_mask[:, None]
    neg = jnp.asarray(-1e30, logits.dtype)
    ml = jnp.where(m > 0, logits, neg)
    seg_max = jax.ops.segment_max(
        ml, ga.receivers, num_segments=ga.num_recv, indices_are_sorted=True
    )
    seg_max = jnp.maximum(jnp.maximum(seg_max, self_logits), neg)
    seg_max = jax.lax.stop_gradient(seg_max)
    shifted = jnp.exp(ml - jnp.take(seg_max, ga.receivers, axis=0)) * m
    denom = jax.ops.segment_sum(
        shifted, ga.receivers, num_segments=ga.num_recv,
        indices_are_sorted=True,
    )
    self_exp = jnp.exp(self_logits - seg_max)
    denom = jnp.maximum(denom + self_exp, 1e-16)
    w = shifted / jnp.take(denom, ga.receivers, axis=0)
    self_w = self_exp / denom

    msgs = jnp.take(xp_ext, ga.senders, axis=0) * w[..., None]
    out_r = jax.ops.segment_sum(
        msgs * m[..., None], ga.receivers, num_segments=ga.num_recv,
        indices_are_sorted=True,
    )
    out_r = (out_r + xp_r * self_w[..., None]).mean(axis=1)
    out_s = xp_s.mean(axis=1)                  # self-only softmax -> w=1
    if "bias" in core_p:
        out_r = out_r + core_p["bias"]
        out_s = out_s + core_p["bias"]
    return out_s, out_r


def _gat_stack_bipartite(gl_p, cfg, x_send, x_recv, ga: GraphArrays,
                         num_shards: int):
    """GraphLayerModule's GATConv branch over a bipartite graph — the
    attention-model encoder/decoder stacks (VERDICT r4 task 8; previously
    these fell to the GSPMD path at 2310.9 vs 1921.0 ms)."""
    heads = cfg.gat_props.num_heads if cfg.gat_props else 1
    hidden = list(cfg.hidden_dims or [])
    n_layers = len(hidden) + 1
    act_name = (cfg.activation or "prelu").lower()
    for i in range(n_layers):
        x_send, x_recv = _gat_core_bipartite(
            gl_p[f"conv_{i}"]["core"], x_send, x_recv, ga, num_shards,
            heads, ga.edge_mask.astype(x_recv.dtype),
        )
        if i < n_layers - 1:
            if act_name == "prelu":
                alpha = gl_p["act"]["alpha"]
                x_send = _prelu(x_send, alpha)
                x_recv = _prelu(x_recv, alpha)
            else:
                fn = (jax.nn.silu if act_name in ("swish", "silu")
                      else jax.nn.relu)
                x_send, x_recv = fn(x_send), fn(x_recv)
    if cfg.use_layer_norm:
        x_send = _node_ln(x_send, gl_p["norm"])
        x_recv = _node_ln(x_recv, gl_p["norm"])
    return x_send, x_recv


def _gat_stack(gl_p, cfg, x, ga: GraphArrays, num_shards: int):
    """GraphLayerModule's GATConv branch (models/weather.py:137-161)."""
    heads = cfg.gat_props.num_heads if cfg.gat_props else 1
    hidden = list(cfg.hidden_dims or [])
    n_layers = len(hidden) + 1
    act_name = (cfg.activation or "prelu").lower()
    for i in range(n_layers):
        x, _ = _gat_core(gl_p[f"conv_{i}"]["core"], x, ga, num_shards,
                         heads, ga.edge_mask.astype(x.dtype))
        if i < n_layers - 1:
            if act_name == "prelu":
                x = _prelu(x, gl_p["act"]["alpha"])
            else:
                fn = (jax.nn.silu if act_name in ("swish", "silu")
                      else jax.nn.relu)
                x = fn(x)
    if cfg.use_layer_norm:
        x = _node_ln(x, gl_p["norm"])
    return x


def _sparse_gat(gl_p, cfg, x, ga: GraphArrays, num_shards: int,
                edge_mask, attention_threshold, prune: bool):
    """SparseGATConv (models/gnn.py:197-226): GAT + threshold pruning of the
    per-shard edge mask (the reference's in-place graph mutation as a
    functional mask update, reference src/models.py:341-365)."""
    heads = cfg.gat_props.num_heads if cfg.gat_props else 1
    out, alpha = _gat_core(gl_p["conv_0"]["core"], x, ga, num_shards,
                           heads, edge_mask)
    if prune:
        new_mask = edge_mask * (alpha >= attention_threshold).astype(
            edge_mask.dtype
        )
    else:
        new_mask = edge_mask
    if cfg.use_layer_norm:
        out = _node_ln(out, gl_p["norm"])
    return out, new_mask


def _interaction_processor(
    inet_p, x, ga: GraphArrays, num_shards: int, use_layer_norm: bool,
    activation: str,
):
    """InteractionNetProcessor (models/gnn.py:481-531) on the sharded mesh.

    Same parameter layout (nn.scan stacked steps); node/edge MLP first
    matmuls are split by input block so only node PROJECTIONS cross shards.
    """
    p = inet_p
    enc_p = p["edge_encoder_lin"]
    e = ga.edge_attr.astype(x.dtype) @ enc_p["kernel"] + enc_p["bias"]
    if activation == "prelu":
        e = _prelu(e, p["edge_encoder_act"]["alpha"])
    else:
        e = jax.nn.silu(e) if activation in ("swish", "silu") else jax.nn.relu(e)
    steps_p = p["steps"]["layer"]
    d = x.shape[-1]
    emaskf = ga.edge_mask

    def act(v, step_p, key):
        if activation == "prelu":
            return _prelu(v, step_p[key]["alpha"])
        return jax.nn.silu(v) if activation in ("swish", "silu") else jax.nn.relu(v)

    use_kernels = (
        activation in ("swish", "silu", "relu")
        and _use_sharded_kernels(ga, d)
    )

    # The degree is scan-invariant (the mask never changes DURING the
    # scan): hoist it — one reduction per processor call, not per MP step.
    deg_hoisted = jax.ops.segment_sum(emaskf, ga.receivers,
                                      num_segments=ga.num_recv)

    def body(carry, step_p):
        x, e = carry
        k0 = step_p["edge_mlp"]["lin_0"]["kernel"]
        b0 = step_p["edge_mlp"]["lin_0"]["bias"]
        xs = x @ k0[:d]
        xr = x @ k0[d: 2 * d]
        ep = e @ k0[2 * d:]
        ext = _halo_rows(xs, ga, num_shards)
        deg = deg_hoisted
        if use_kernels:
            # Same fused custom-VJP edge unit as the single-chip trainer
            # (ops.fused_edge): both backward scatters through the Pallas
            # sorted-segment kernel; the projection/halo backward composes
            # automatically (shard_map transposes the collectives).
            from ..ops.fused_edge import _StaticPre, edge_gather_mlp_agg

            static = _StaticPre(
                num_sender_rows=ga.num_sender_rows,
                num_receivers=ga.num_recv,
                tile_receivers=ga.tile_receivers,
                activation="swish" if activation == "silu" else activation,
                interpret=jax.default_backend() == "cpu",
            )
            e_upd, agg_sum = edge_gather_mlp_agg(
                static, ext, xr, ep, b0,
                step_p["edge_mlp"]["lin_1"]["kernel"],
                step_p["edge_mlp"]["lin_1"]["bias"],
                emaskf.astype(x.dtype), ga.senders, ga.receivers,
                ga.r_chunk_base, ga.r_chunk_tile,
                ga.s_perm, ga.s_sorted, ga.s_chunk_base, ga.s_chunk_tile,
            )
            agg = agg_sum
        else:
            h = (
                jnp.take(ext, ga.senders, axis=0)
                + jnp.take(xr, ga.receivers, axis=0)
                + ep + b0
            )
            h = act(h, step_p["edge_mlp"], "act")
            e_upd = (h @ step_p["edge_mlp"]["lin_1"]["kernel"]
                     + step_p["edge_mlp"]["lin_1"]["bias"])
            msgs = e_upd * emaskf[:, None].astype(e_upd.dtype)
            agg = jax.ops.segment_sum(msgs, ga.receivers,
                                      num_segments=ga.num_recv)
        agg = agg / jnp.maximum(deg, 1.0)[:, None].astype(agg.dtype)
        node_in = jnp.concatenate([x, agg], axis=-1)
        h2 = act(
            node_in @ step_p["node_mlp"]["lin_0"]["kernel"]
            + step_p["node_mlp"]["lin_0"]["bias"],
            step_p["node_mlp"], "act",
        )
        n_upd = (h2 @ step_p["node_mlp"]["lin_1"]["kernel"]
                 + step_p["node_mlp"]["lin_1"]["bias"])
        new_e = e + e_upd
        new_x = x + n_upd
        if use_layer_norm:
            new_e = _graph_ln_psum(new_e, step_p["edge_norm"], emaskf)
            new_x = _node_ln(new_x, step_p["node_norm"])
        return (new_x, new_e), None

    # Optional per-step remat of the sharded scan (GCLT_SHARDED_SCAN_REMAT,
    # falling back to GCLT_SCAN_REMAT): "full" recomputes each step in the
    # backward — needed when per-shard edge intermediates for all steps
    # would overflow HBM (e.g. the S=1 whole-model-on-one-chip bench).
    import os as _os

    _mode = _os.environ.get(
        "GCLT_SHARDED_SCAN_REMAT", _os.environ.get("GCLT_SCAN_REMAT", "none")
    ).lower()
    if _mode == "full":
        body = jax.checkpoint(body, prevent_cse=False)
    (x, e), _ = jax.lax.scan(body, (x, e), steps_p)
    return x


# --------------------------------------------------------------------------
# Full per-shard forward
# --------------------------------------------------------------------------


class ShardedWeatherForward:
    """Per-shard forward of the full WeatherModel (static config holder).

    ``__call__(params, x_grid [G_s, obs·F], arrs)`` runs INSIDE shard_map and
    returns the grid delta [G_s, C_out].  Consumes WeatherModel's parameter
    pytree unchanged.
    """

    def __init__(self, pipeline: PipelineConfig, data: DataConfig,
                 num_shards: int):
        self.pipeline = pipeline
        self.data = data
        self.num_shards = num_shards
        self._validate()

    def _validate(self):
        pl = self.pipeline
        if pl.product_graph is not None:
            raise NotImplementedError(
                "product-graph models use the GSPMD path"
            )
        for name in ("encoder", "decoder"):
            mc = getattr(pl, name)
            if mc.gcn.layer_type not in (
                GraphLayerType.ConvGCN, GraphLayerType.GATConv,
            ):
                raise NotImplementedError(
                    f"sharded {name} supports ConvGCN/GATConv only "
                    f"(got {mc.gcn.layer_type}); use the GSPMD path"
                )
            if mc.gcn.use_layer_norm and (mc.gcn.layer_norm_mode or "node") != "node":
                raise NotImplementedError("graph-mode trailing LN unsupported")
            if mc.mlp is not None and mc.mlp.use_layer_norm and (
                mc.mlp.layer_norm_mode or "node"
            ) != "node":
                raise NotImplementedError("graph-mode MLP LN unsupported")
        if pl.processor.gcn.layer_type not in (
            GraphLayerType.InteractionNet, GraphLayerType.ConvGCN,
            GraphLayerType.GATConv, GraphLayerType.SparseGATConv,
        ):
            raise NotImplementedError(
                "sharded processor supports InteractionNet/ConvGCN/GAT/"
                "SparseGAT only"
            )

    @property
    def sparse_gat(self) -> bool:
        return (self.pipeline.processor.gcn.layer_type
                == GraphLayerType.SparseGATConv)

    def __call__(self, params, x_grid: jnp.ndarray, arrs_local,
                 proc_edge_mask=None, attention_threshold=0.0,
                 prune: bool = False):
        """Returns (grid delta [G_s, C_out], new processing edge mask) —
        the mask is the input mask unchanged except under SparseGAT pruning
        (per-shard [E] layout)."""
        p = params["params"] if "params" in params else params
        pl = self.pipeline
        s_n = self.num_shards

        grid_in = jnp.concatenate(
            [x_grid, arrs_local.grid_static.astype(x_grid.dtype)], axis=-1
        )
        mesh_dyn = jnp.zeros(
            (arrs_local.mesh_static.shape[0], x_grid.shape[-1]), x_grid.dtype
        )
        mesh_in = jnp.concatenate(
            [mesh_dyn, arrs_local.mesh_static.astype(x_grid.dtype)], axis=-1
        )

        # Encoder: (MLP) + GCN stack over G2M (senders grid, receivers mesh).
        pe = p["encoder"]
        if pl.encoder.mlp is not None:
            grid_in = _mlp_tower(pe["mlp"], grid_in)
            mesh_in = _mlp_tower(pe["mlp"], mesh_in)
        if pl.encoder.gcn.layer_type == GraphLayerType.GATConv:
            grid_latent, mesh_latent = _gat_stack_bipartite(
                pe["graph_layer"], pl.encoder.gcn, grid_in, mesh_in,
                arrs_local.enc, s_n,
            )
        else:
            grid_latent, mesh_latent = _gcn_stack(
                pe["graph_layer"], pl.encoder.gcn, grid_in, mesh_in,
                arrs_local.enc, s_n, bipartite=True,
            )

        # Processor over E_M (mesh-local).
        pp = p["processor"]
        x_mesh = mesh_latent
        new_mask = proc_edge_mask
        if pl.processor.mlp is not None:
            x_mesh = _mlp_tower(pp["mlp"], x_mesh)
        lt = pl.processor.gcn.layer_type
        if lt == GraphLayerType.InteractionNet:
            use_ln = (pl.processor.gcn.use_layer_norm
                      if pl.processor.gcn.use_layer_norm is not None else True)
            mesh_processed = _interaction_processor(
                pp["graph_layer"]["inet"], x_mesh, arrs_local.proc, s_n,
                use_ln, (pl.processor.gcn.activation or "swish").lower(),
            )
        elif lt == GraphLayerType.GATConv:
            mesh_processed = _gat_stack(
                pp["graph_layer"], pl.processor.gcn, x_mesh,
                arrs_local.proc, s_n,
            )
        elif lt == GraphLayerType.SparseGATConv:
            mask = (proc_edge_mask if proc_edge_mask is not None
                    else arrs_local.proc.edge_mask).astype(x_mesh.dtype)
            mesh_processed, new_mask = _sparse_gat(
                pp["graph_layer"], pl.processor.gcn, x_mesh,
                arrs_local.proc, s_n, mask, attention_threshold, prune,
            )
        else:
            _, mesh_processed = _gcn_stack(
                pp["graph_layer"], pl.processor.gcn, x_mesh, x_mesh,
                arrs_local.proc, s_n, bipartite=False,
            )

        # Decoder: (MLP) + GCN stack over M2G (senders mesh, receivers grid).
        pd = p["decoder"]
        g = grid_latent
        m = mesh_processed
        if pl.decoder.mlp is not None:
            g = _mlp_tower(pd["mlp"], g)
            m = _mlp_tower(pd["mlp"], m)
        if pl.decoder.gcn.layer_type == GraphLayerType.GATConv:
            _, out_grid = _gat_stack_bipartite(
                pd["graph_layer"], pl.decoder.gcn, m, g,
                arrs_local.dec, s_n,
            )
        else:
            _, out_grid = _gcn_stack(
                pd["graph_layer"], pl.decoder.gcn, m, g,
                arrs_local.dec, s_n, bipartite=True,
            )
        return out_grid, new_mask


# --------------------------------------------------------------------------
# Train / eval steps
# --------------------------------------------------------------------------


def _strip_shard_axis(arrs: PlanArrays, pvary_data: bool = True) -> PlanArrays:
    """Per-shard slice (+ optionally promote to varying over 'data' so the
    plan arrays compose with data-parallel activations under shard_map's VMA
    tracking; they are replicated over 'data', pcast makes that explicit)."""
    if pvary_data:
        return jax.tree.map(
            lambda a: jax.lax.pcast(a[0], "data", to="varying"), arrs
        )
    return jax.tree.map(lambda a: a[0], arrs)


def make_sharded_forward(fwd: "ShardedWeatherForward", mesh: Mesh) -> Callable:
    """Jitted single-step sharded forward:
    ``f(params, x_sh [B, S, G_s, obs·F], arrs, edge_mask=None) ->
    delta [B, S, G_s, C]``.

    ``edge_mask`` is the per-shard [S, E_s] processing-edge mask (sharded
    over "space") — pass a TrainState's pruned SparseGAT mask so forward
    inference of a trained SparseGAT model doesn't silently fall back to the
    unpruned plan mask."""
    axes = tuple(mesh.axis_names)
    assert axes == ("data", "space")
    assert mesh.devices.shape[-1] == fwd.num_shards, (
        f"mesh space axis {mesh.devices.shape[-1]} != plan shards "
        f"{fwd.num_shards}"
    )

    def body(params, x, arrs, edge_mask=None):
        al = _strip_shard_axis(arrs)
        if edge_mask is not None:
            edge_mask = jax.lax.pcast(edge_mask[0], "data", to="varying")
        out = jax.vmap(lambda xi: fwd(params, xi, al, edge_mask)[0])(x[:, 0])
        return out[:, None]

    # pallas_call outputs carry no VMA annotation on real TPU backends; the
    # per-shard kernel path would fail shard_map's check otherwise (numerics
    # are parity-tested in tests/test_sharded_model.py).  The check stays on
    # for pure-XLA builds (_check_vma).
    smap_plain = jax.shard_map(
        lambda p, x, a: body(p, x, a), mesh=mesh,
        in_specs=(P(), P(*axes), P(axes[-1])),
        out_specs=P(*axes),
        check_vma=_check_vma(),
    )
    smap_masked = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(*axes), P(axes[-1]), P(axes[-1])),
        out_specs=P(*axes),
        check_vma=_check_vma(),
    )
    jplain = jax.jit(smap_plain)
    jmasked = jax.jit(smap_masked)

    def call(params, x, arrs, edge_mask=None):
        if edge_mask is None:
            return jplain(params, x, arrs)
        return jmasked(params, x, arrs, edge_mask)

    return call


def _local_weights(arrs_local, chan_mask, num_features):
    """[G_s, C] per-element loss weights (0 on padding rows)."""
    w = arrs_local.loss_weight[:, None]
    if chan_mask is not None:
        w = w * chan_mask[None, :]
    else:
        w = jnp.broadcast_to(w, (w.shape[0], num_features))
    return w


def _cast_tree(tree, dtype):
    if dtype == jnp.float32:
        return tree
    return jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, tree
    )


def make_sharded_train_step(
    fwd: ShardedWeatherForward,
    spec: RolloutSpec,
    mesh: Mesh,
    optimizer,
    steps: int,
    chan_mask: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.float32,
    freeze_processor: bool = False,
    prune: bool = False,
) -> Callable:
    """Returns jitted ``step(params, opt_state, x_sh, y_sh, arrs) ->
    (params, opt_state, loss)`` — or, for a SparseGAT processor
    (``fwd.sparse_gat``), ``step(params, opt_state, x_sh, y_sh, arrs,
    edge_mask, thr) -> (params, opt_state, loss, new_mask)`` with the
    pruning mask in the per-shard [S, E] layout, sharded over "space".

    ``x_sh``: [B, S, G_s, obs·F] sharded ``P("data", "space")``;
    ``y_sh``: [B, S, G_s, P·F].  Params/opt_state replicated.
    """
    obs, nf = spec.obs_window, spec.num_features
    if spec.direct_steps > 1:
        raise NotImplementedError(
            "direct multi-step (P·C decode) models are not wired into the "
            "explicit shard_map rollout yet — train them single-chip or "
            "through the GSPMD path (parallel.sharding)"
        )
    axes = tuple(mesh.axis_names)
    assert axes == ("data", "space"), (
        f"sharded train step expects a ('data', 'space') mesh, got {axes}"
    )
    assert mesh.devices.shape[-1] == fwd.num_shards, (
        f"mesh space axis {mesh.devices.shape[-1]} != plan shards "
        f"{fwd.num_shards}"
    )
    sparse_gat = fwd.sparse_gat

    def body(params, opt_state, x, y, arrs, edge_mask=None, thr=0.0):
        x = x[:, 0]      # local: [B_l, G_s, obs·F]
        y = y[:, 0]
        al = _strip_shard_axis(arrs)
        if edge_mask is not None:
            edge_mask = jax.lax.pcast(edge_mask[0], "data", to="varying")
        g_s = x.shape[1]
        b_l = x.shape[0]
        w = _local_weights(al, chan_mask, nf)          # [G_s, C]

        def num_fn(params):
            params_c = _cast_tree(params, compute_dtype)
            window = x.reshape(b_l, g_s, obs, nf).astype(compute_dtype)
            targets = y.reshape(b_l, g_s, -1, nf).astype(compute_dtype)
            wc = w.astype(compute_dtype)
            mask = (edge_mask.astype(compute_dtype)
                    if edge_mask is not None else None)

            def one_step(window, mask, do_prune):
                inp = window.reshape(b_l, g_s, obs * nf)
                delta, masks = jax.vmap(
                    lambda xi: fwd(params_c, xi, al, mask, thr, do_prune)
                )(inp)
                # pruning is a batch-level decision: keep sample 0's mask
                # (reference prunes on batch_num == 0)
                new_mask = masks[0] if masks is not None else None
                if spec.use_residual:
                    return window[:, :, -1, :] + delta, new_mask
                return delta, new_mask

            step_fn = (jax.checkpoint(one_step, static_argnums=(2,))
                       if spec.remat else one_step)
            num = jnp.float32(0.0)
            for step in range(steps):
                # reference prunes once per batch (first model call)
                out, mask = step_fn(window, mask, prune and step == 0)
                tgt = targets[:, :, step, :]
                num = num + (jnp.square(out - tgt) * wc).sum().astype(
                    jnp.float32
                )
                out = carry_forward(out, window[:, :, -1, :], tgt, spec)
                window = jnp.concatenate(
                    [window[:, :, 1:, :], out[:, :, None, :]], axis=2
                )
            return num, mask

        (num, new_mask), grads = jax.value_and_grad(
            num_fn, has_aux=True
        )(params)
        den_local = w.sum() * b_l                      # param-free
        num = jax.lax.psum(num, axes)
        den = jnp.maximum(jax.lax.psum(den_local, axes), 1e-12)
        scale = 1.0 / (den * steps)
        grads = jax.tree.map(
            lambda g: (g.astype(jnp.float32) * scale), grads
        )
        grads = jax.lax.psum(grads, axes)
        loss = num * scale
        if freeze_processor:
            from ..training.trainer import _zero_processor_grads

            grads = _zero_processor_grads(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if sparse_gat:
            # one canonical mask per batch: data row 0's (different data
            # rows saw different samples); psum of a row-0 selection proves
            # data-replication to shard_map's VMA check
            idx = jax.lax.axis_index(axes[0])
            new_mask = jax.lax.psum(
                jnp.where(idx == 0, new_mask.astype(jnp.float32),
                          jnp.zeros_like(new_mask, jnp.float32)),
                axes[0],
            )
            return params, opt_state, loss, new_mask[None]
        return params, opt_state, loss

    if sparse_gat:
        smap = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P(), P(*axes), P(*axes), P(axes[-1]),
                      P(axes[-1]), P()),
            out_specs=(P(), P(), P(), P(axes[-1])),
            check_vma=_check_vma(),
        )
    else:
        smap = jax.shard_map(
            lambda p, o, x, y, a: body(p, o, x, y, a),
            mesh=mesh,
            in_specs=(P(), P(), P(*axes), P(*axes), P(axes[-1])),
            out_specs=(P(), P(), P()),
            check_vma=_check_vma(),
        )
    return jax.jit(smap, donate_argnums=(0, 1))


def make_sharded_eval_step(
    fwd: ShardedWeatherForward,
    spec: RolloutSpec,
    mesh: Mesh,
    chan_mask: Optional[jnp.ndarray] = None,
    exclude_channels: Tuple[int, ...] = (),
) -> Callable:
    """Jitted ``eval(params, x_sh, y_sh, sample_mask, arrs) ->
    (loss, acc, raw_rmse)`` on the first rollout step (mirrors
    Trainer._make_eval_step).

    The batch is SHARDED over the data axis (``P("data", "space")``) so each
    data row computes 1/data of the samples (round-2 eval replicated the
    batch and wasted (data-1)/data of the chips).  Partial batches are
    handled by zero-padding to a multiple of the data axis and passing
    ``sample_mask`` [B_pad] (1 for real samples): all reductions weight by
    it, so results are independent of padding."""
    obs, nf = spec.obs_window, spec.num_features
    axes = tuple(mesh.axis_names)
    assert axes == ("data", "space"), (
        f"sharded eval step expects a ('data', 'space') mesh, got {axes}"
    )
    assert mesh.devices.shape[-1] == fwd.num_shards, (
        f"mesh space axis {mesh.devices.shape[-1]} != plan shards "
        f"{fwd.num_shards}"
    )
    space = axes[-1]
    keep = np.array(
        [i for i in range(nf) if i not in set(exclude_channels)], np.int32
    )

    sparse_gat = fwd.sparse_gat

    def body(params, x, y, sample_mask, arrs, edge_mask=None):
        x = x[:, 0]
        y = y[:, 0]
        al = _strip_shard_axis(arrs)
        if edge_mask is not None:
            edge_mask = jax.lax.pcast(edge_mask[0], "data", to="varying")
        b_l, g_s = x.shape[0], x.shape[1]
        sm = sample_mask                                # [b_l] local samples
        n_samples = jnp.maximum(jax.lax.psum(sm.sum(), axes[0]), 1.0)
        window = x.reshape(b_l, g_s, obs, nf)
        targets = y.reshape(b_l, g_s, -1, nf)
        inp = window.reshape(b_l, g_s, obs * nf)
        delta = jax.vmap(
            lambda xi: fwd(params, xi, al, edge_mask)[0]
        )(inp)
        out = window[:, :, -1, :] + delta if spec.use_residual else delta
        tgt = targets[:, :, 0, :]
        out = carry_forward(out, window[:, :, -1, :], tgt, spec)

        w = _local_weights(al, chan_mask, nf)           # [G_s, C]
        wsm = sm[:, None, None] * w[None]               # [b_l, G_s, C]
        num = jax.lax.psum((jnp.square(out - tgt) * wsm).sum(), axes)
        den = jnp.maximum(jax.lax.psum(wsm.sum(), axes), 1e-12)
        loss = num / den

        nm = al.grid_mask[None, :, None]                # [1, G_s, 1]
        n_nodes = jax.lax.psum(al.grid_mask.sum(), space)
        nmsm = sm[:, None, None] * nm
        rmse_num = jax.lax.psum((jnp.square(out - tgt) * nmsm).sum(), axes)
        rmse_den = jnp.maximum(
            jax.lax.psum(nmsm.sum() * nf, axes), 1.0
        )
        raw_rmse = jnp.sqrt(rmse_num / rmse_den)

        # Masked spatial ACC (loss.anomaly_correlation semantics): spatial
        # moments psum over "space" per sample, sample mean over "data".
        def moments(v):
            mean = jax.lax.psum((v * nm).sum(axis=1), space) / n_nodes
            var = jax.lax.psum(
                (jnp.square(v - mean[:, None, :]) * nm).sum(axis=1), space
            ) / n_nodes
            return mean, jnp.sqrt(var)

        mp, sp = moments(out)
        mt, st = moments(tgt)
        pn = (out - mp[:, None, :]) / (sp[:, None, :] + 1e-8)
        tn = (tgt - mt[:, None, :]) / (st[:, None, :] + 1e-8)
        acc_pf = jax.lax.psum((pn * tn * nm).sum(axis=1), space) / n_nodes
        acc_per_sample = acc_pf[:, keep].mean(axis=1)   # [b_l]
        acc = jax.lax.psum((acc_per_sample * sm).sum(), axes[0]) / n_samples
        return loss, acc, raw_rmse

    if sparse_gat:
        smap = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P(*axes), P(*axes), P(axes[0]), P(space),
                      P(space)),
            out_specs=(P(), P(), P()),
            check_vma=_check_vma(),
        )
    else:
        smap = jax.shard_map(
            lambda p, x, y, sm, a: body(p, x, y, sm, a),
            mesh=mesh,
            in_specs=(P(), P(*axes), P(*axes), P(axes[0]), P(space)),
            out_specs=(P(), P(), P()),
            check_vma=_check_vma(),
        )
    return jax.jit(smap)
