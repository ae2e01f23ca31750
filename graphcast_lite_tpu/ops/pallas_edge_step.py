"""Pallas TPU kernel: one WHOLE InteractionNet edge step per pass.

The measured cost of a message-passing step at the flagship scale
(E=261K edges, hidden 256, bf16) is dominated not by FLOPs but by
[E, 256]-sized HBM round trips and row gathers.  This kernel executes the
entire edge side of one step in a single streaming pass over the edge
arrays:

    h    = xsg + XR_window_expand + v @ W1e_eff + b_eff   (per edge chunk)
    u    = act(h) @ W2 + b2
    v'   = a ∘ v + c + u                                  (lazy-LN residual)
    agg += OneHot[TR, TE] @ (u · mask)                    (segment sum)
    stats += (Σ v'·w, Σ v'²·w, Σ w)                       (masked LN stats)

where

* ``xsg`` is the sender-projected gather ``(x @ W1s)[senders]`` — the one
  remaining XLA gather.  Receivers need NO gather: edges are receiver-
  sorted, so a chunk's receivers form a contiguous window of the receiver
  table; the kernel DMAs that window ([W_R, H], host-precomputed 16-aligned
  base) and expands it with a one-hot MXU matmul.  Because the window
  covers EVERY row the chunk touches (span-checked at schedule build),
  overlap chunks (16-row DMA alignment, end-of-array clamping, inert
  empty-tile chunks) write value-identical ``v'`` rows — write order
  between overlapping chunks is immaterial;
* ``v`` is the PRE-norm edge carrier of the lazy-LN scan
  (``models.gnn._LazyINLayer``), with ``(a, c)`` the folded affine of the
  previous step's graph-mode LayerNorm;
* the stats windows (``win_lo/win_hi``) assign every edge row to exactly
  one chunk, so overlap chunks never double-count the LayerNorm
  statistics; the aggregation one-hot self-filters rows outside the
  chunk's receiver TILE (``ops.pallas_segment`` conventions, negative
  tile id = inert chunk).

Per step the only [E, ·] HBM traffic left is: xsg write+read, v read,
v' write — edge_update, the masked copy, and both LayerNorm passes live
entirely in VMEM.

No autodiff rule: used by forward-only traces (and inside custom_vjp
forwards).  Parity oracle: the composed jnp expressions —
tests/test_pallas_edge_step.py (interpret mode).

Replaces the reference's per-step PyG gather/scatter pipeline
(reference src/models.py:206-236) with a single fused TPU pass.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["StepSchedule", "build_step_schedule", "edge_step_fused",
           "supports_edge_step"]

TILE_EDGES = 1024
ALIGN = 16          # bf16 sublane tiling: row DMA bases must be 16-aligned
_N_BUF = 4
_SCRATCH_BUDGET_BYTES = 6 * 1024 * 1024


class StepSchedule(NamedTuple):
    """Host-built chunk schedule for :func:`edge_step_fused` (static)."""

    base: np.ndarray       # [NC] int32, ALIGN-aligned, clamped to e_pad-TE
    tile: np.ndarray       # [NC] int32 (negative = inert)
    win_lo: np.ndarray     # [NC] int32 stats-ownership window start (row)
    win_hi: np.ndarray     # [NC] int32 window end
    rwin: np.ndarray       # [NC] int32 receiver-window base (ALIGN-aligned)
    recv: np.ndarray       # [NC, TE] int32 absolute receiver ids per row
    num_tiles: int
    win_r: int             # receiver-window height W_R
    xr_rows: int           # required receiver-table height (padded)


def build_step_schedule(
    recv_padded: np.ndarray,
    num_receivers: int,
    tile_receivers: int = 256,
) -> StepSchedule | None:
    """Chunk schedule over a receiver-sorted padded edge array.

    Returns None when the array is too small (e_pad < TILE_EDGES) or a
    chunk's receiver span exceeds the largest supported window (mean
    in-degree < ~1) — callers fall back to the composed ops.
    """
    recv_padded = np.asarray(recv_padded, np.int64)
    e_pad = int(recv_padded.shape[0])
    if e_pad < TILE_EDGES or e_pad % ALIGN != 0:
        return None
    tr, te = tile_receivers, TILE_EDGES
    ntiles = (num_receivers + tr - 1) // tr
    bounds = np.arange(0, ntiles + 1) * tr
    offs = np.searchsorted(recv_padded, bounds, side="left")
    # padding rows carry receiver num_receivers-1: inside the last tile
    offs[-1] = e_pad

    bases, tiles, ends = [], [], []
    for t in range(ntiles):
        start, end = int(offs[t]), int(offs[t + 1])
        if end <= start:
            bases.append(0)
            tiles.append(-(t + 1))
            ends.append(0)
            continue
        s16 = (start // ALIGN) * ALIGN
        k = (end - s16 + te - 1) // te
        for c in range(k):
            bases.append(min(s16 + c * te, e_pad - te))
            tiles.append(t)
            ends.append(end)

    nc = len(bases)
    base = np.asarray(bases, np.int32)
    tile = np.asarray(tiles, np.int32)
    lo = np.zeros(nc, np.int32)
    hi = np.zeros(nc, np.int32)
    covered = 0
    for i in range(nc):
        if tile[i] < 0:
            continue
        b = int(base[i])
        l = min(max(covered - b, 0), te)
        h = max(l, min(te, ends[i] - b))
        lo[i], hi[i] = l, h
        covered = max(covered, b + h)
    assert covered == e_pad, (covered, e_pad)

    # Receiver windows: each chunk's receivers are contiguous (sorted);
    # find the smallest power-of-two window that covers every chunk's span.
    r_first = recv_padded[base]                   # [NC]
    r_last = recv_padded[base + te - 1]
    rwin = (r_first // ALIGN) * ALIGN
    span = int((r_last - rwin).max()) + 1
    win_r = 512
    while win_r < span and win_r < 2048:
        win_r *= 2
    if span > win_r:
        return None
    xr_rows = max(ntiles * tr, win_r)
    rwin = np.minimum(rwin, xr_rows - win_r).astype(np.int32)

    idx = base[:, None].astype(np.int64) + np.arange(te)[None, :]
    recv = recv_padded[idx].astype(np.int32)
    return StepSchedule(base, tile, lo, hi, rwin, recv, ntiles, win_r,
                        xr_rows)


def supports_edge_step(graph, hidden_dim: int, edge_dim: int,
                       activation: str) -> bool:
    """Structural eligibility (size policy lives in the caller's gate)."""
    return (
        getattr(graph, "step_sched", None) is not None
        and activation in ("swish", "silu", "relu")
        and hidden_dim % 128 == 0
        and edge_dim % 128 == 0
    )


def _act(name: str, x):
    if name in ("swish", "silu"):
        return jax.nn.silu(x)
    return jnp.maximum(x, 0.0)


def _kernel(
    base_ref, tile_ref, lo_ref, hi_ref, rwin_ref,  # scalar prefetch [NC]
    xsg_ref,        # HBM ANY: [E_pad, H] sender-projected rows
    v_ref,          # HBM ANY: [E_pad, De] pre-norm edge carrier
    xr_ref,         # HBM ANY: [xr_rows, H] receiver projections
    recv_ref,       # VMEM block [1, 1, TE] int32 (indexed by chunk)
    mask_ref,       # VMEM block [1, 1, TE] float32 (indexed by chunk)
    w1e_ref,        # VMEM [De, H] (a-folded)
    w2_ref,         # VMEM [H, De]
    beff_ref,       # VMEM [1, H]
    b2_ref,         # VMEM [1, De]
    ac_ref,         # VMEM [2, De] float32: rows (a, c)
    vout_ref,       # HBM ANY out: [E_pad, De]
    agg_ref,        # VMEM out block [TR, De] float32 (indexed by tile)
    stats_ref,      # VMEM out block [8, 128] float32 (constant)
    xsg_s,          # VMEM [NB, TE, H]
    v_s,            # VMEM [NB, TE, De]
    xr_s,           # VMEM [NB, WR, H]
    vout_s,         # VMEM [2, TE, De]
    sems,           # DMA sems [NB, 3]
    osem,           # DMA sems [2]
    *,
    tile_receivers: int,
    win_r: int,
    n_buf: int,
    activation: str,
):
    i = pl.program_id(0)
    nc = pl.num_programs(0)
    tr, te, wr = tile_receivers, TILE_EDGES, win_r
    t_enc = tile_ref[i]
    t_dec = jnp.maximum(t_enc, -t_enc - 1)
    live = (t_enc >= 0).astype(jnp.float32)
    r0 = t_dec * tr

    def make_dma(slot, ci):
        b = pl.multiple_of(base_ref[ci], ALIGN)
        rw = pl.multiple_of(rwin_ref[ci], ALIGN)
        return (
            pltpu.make_async_copy(
                xsg_ref.at[pl.ds(b, te), :], xsg_s.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_ref.at[pl.ds(b, te), :], v_s.at[slot],
                sems.at[slot, 1],
            ),
            pltpu.make_async_copy(
                xr_ref.at[pl.ds(rw, wr), :], xr_s.at[slot],
                sems.at[slot, 2],
            ),
        )

    @pl.when(i == 0)
    def _():
        for c in range(n_buf):
            @pl.when(c < nc)
            def _(c=c):
                for d in make_dma(c, c):
                    d.start()

    slot = i % n_buf
    for d in make_dma(slot, i):
        d.wait()

    f32 = jnp.float32
    dt = v_s.dtype
    xsg = xsg_s[slot]                                   # [TE, H]
    v = v_s[slot]                                       # [TE, De]
    recv_row = recv_ref[0, 0, :].reshape(1, te)         # [1, TE] int32
    mrow = mask_ref[0, 0, :].reshape(1, te) * live      # [1, TE] f32

    # Receiver expand over the chunk's window: [TE, WR] one-hot @ xr win.
    cols = jax.lax.broadcasted_iota(jnp.int32, (te, wr), 1)
    recv_col = recv_row.reshape(te, 1) - rwin_ref[i]    # int32: reshape ok
    rmatch = jnp.where(cols == recv_col, 1.0, 0.0).astype(jnp.bfloat16)
    xr_exp = jax.lax.dot_general(
        rmatch, xr_s[slot],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).astype(dt)                                        # [TE, H]

    ep = jax.lax.dot_general(
        v, w1e_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).astype(dt)
    h = xsg + xr_exp + ep + beff_ref[0, :]
    u_cast = (
        jax.lax.dot_general(
            _act(activation, h.astype(f32)).astype(dt), w2_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).astype(dt)
        + b2_ref[0, :]
    )                                                   # [TE, De]

    a_row = ac_ref[0:1, :].astype(dt)                   # [1, De]
    c_row = ac_ref[1:2, :].astype(dt)
    vout = a_row * v + c_row + u_cast

    oslot = i % 2

    @pl.when(i >= 2)
    def _():
        pltpu.make_async_copy(
            vout_s.at[oslot], vout_ref.at[pl.ds(0, te), :], osem.at[oslot]
        ).wait()

    vout_s[oslot] = vout
    b_here = pl.multiple_of(base_ref[i], ALIGN)
    out_dma = pltpu.make_async_copy(
        vout_s.at[oslot], vout_ref.at[pl.ds(b_here, te), :], osem.at[oslot]
    )
    out_dma.start()

    @pl.when(i == nc - 1)
    def _():
        out_dma.wait()

        @pl.when(nc >= 2)
        def _():
            pltpu.make_async_copy(
                vout_s.at[1 - oslot], vout_ref.at[pl.ds(0, te), :],
                osem.at[1 - oslot],
            ).wait()

    # Segment aggregation of u into the receiver TILE.  The ownership
    # window makes every edge row contribute from exactly ONE chunk (its
    # owner is always a chunk of its own tile — windows are capped at tile
    # ends), de-duplicating clamped/overlap chunks; the receiver-range
    # test additionally drops other tiles' rows.
    it_row = jax.lax.broadcasted_iota(jnp.int32, (1, te), 1)
    awin = jnp.where(
        jnp.logical_and(it_row >= lo_ref[i], it_row < hi_ref[i]), 1.0, 0.0
    )
    rows = jax.lax.broadcasted_iota(jnp.int32, (tr, te), 0)
    local = recv_row - r0
    oh = (
        jnp.where(rows == local, 1.0, 0.0) * (mrow * awin)
    ).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        oh, u_cast,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )

    prev = tile_ref[jnp.maximum(i - 1, 0)]
    prev_dec = jnp.maximum(prev, -prev - 1)
    is_first = jnp.logical_or(i == 0, prev_dec != t_dec)

    @pl.when(is_first)
    def _():
        agg_ref[:] = acc

    @pl.when(jnp.logical_not(is_first))
    def _():
        agg_ref[:] += acc

    # Masked LN stats over THIS chunk's owned window (exactly-once rows).
    rowi = jax.lax.broadcasted_iota(jnp.int32, (te, 1), 0)
    win = jnp.logical_and(rowi >= lo_ref[i], rowi < hi_ref[i])
    wcol = jnp.where(win, 1.0, 0.0) * mask_ref[0, 0, :].reshape(te, 1) * live
    vf = vout.astype(f32)
    sm = jnp.sum(vf * wcol)
    sq = jnp.sum(jnp.square(vf) * wcol)
    cnt = jnp.sum(wcol)
    ri8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    ci8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    at0 = (ci8 == 0).astype(f32)
    blk = (
        jnp.where(ri8 == 0, sm, 0.0) + jnp.where(ri8 == 1, sq, 0.0)
        + jnp.where(ri8 == 2, cnt, 0.0)
    ) * at0

    @pl.when(i == 0)
    def _():
        stats_ref[:] = blk

    @pl.when(i != 0)
    def _():
        stats_ref[:] += blk

    @pl.when(i + n_buf < nc)
    def _():
        for d in make_dma(slot, i + n_buf):
            d.start()


@functools.partial(
    jax.jit,
    static_argnames=("num_receivers", "tile_receivers", "win_r", "xr_rows",
                     "activation", "interpret"),
)
def edge_step_fused(
    xsg: jnp.ndarray,            # [E_pad, H] gathered sender projections
    v: jnp.ndarray,              # [E_pad, De] pre-norm edge carrier
    xr: jnp.ndarray,             # [R, H] receiver projections
    w1e_eff: jnp.ndarray,        # [De, H] (previous-LN a folded in)
    b_eff: jnp.ndarray,          # [H]
    w2: jnp.ndarray,             # [H, De]
    b2: jnp.ndarray,             # [De]
    a: jnp.ndarray,              # [De] float32 lazy-LN scale
    c: jnp.ndarray,              # [De] float32 lazy-LN shift
    mask: jnp.ndarray,           # [E_pad]
    sched_base: jnp.ndarray,     # [NC] int32
    sched_tile: jnp.ndarray,     # [NC] int32
    sched_lo: jnp.ndarray,       # [NC] int32
    sched_hi: jnp.ndarray,       # [NC] int32
    sched_rwin: jnp.ndarray,     # [NC] int32
    sched_recv: jnp.ndarray,     # [NC, TE] int32
    num_receivers: int,
    tile_receivers: int,
    win_r: int,
    xr_rows: int,
    activation: str = "swish",
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (v_new [E_pad, De], agg_sum [R, De] in v.dtype,
    stats [3] float32 = (Σ v'·w, Σ v'²·w, Σ w) over masked rows)."""
    e_pad, h_dim = xsg.shape
    de = v.shape[1]
    tr, te = tile_receivers, TILE_EDGES
    ntiles = (num_receivers + tr - 1) // tr
    r_pad = ntiles * tr
    nc = sched_base.shape[0]
    per_slot = (te * (h_dim + de) + win_r * h_dim) * v.dtype.itemsize
    n_buf = int(np.clip(_SCRATCH_BUDGET_BYTES // per_slot, 2, _N_BUF))

    xr_p = xr
    if xr_rows != xr.shape[0]:
        xr_p = jnp.pad(xr, ((0, xr_rows - xr.shape[0]), (0, 0)))
    idx = sched_base[:, None] + jnp.arange(te, dtype=jnp.int32)[None, :]
    mask_sched = jnp.take(mask.astype(jnp.float32), idx.reshape(-1),
                          axis=0).reshape(nc, 1, te)

    def _c(i, b, t, lo, hi, rw):
        return (0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # xsg
            pl.BlockSpec(memory_space=pltpu.ANY),      # v
            pl.BlockSpec(memory_space=pltpu.ANY),      # xr
            pl.BlockSpec(                               # recv row
                (1, 1, te), lambda i, b, t, lo, hi, rw: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(                               # mask row
                (1, 1, te), lambda i, b, t, lo, hi, rw: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((de, h_dim), _c, memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, de), _c, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_dim), _c, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, de), _c, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, de), _c, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),      # v_new (manual DMA)
            pl.BlockSpec(
                (tr, de),
                lambda i, b, t, lo, hi, rw: (
                    jnp.maximum(t[i], -t[i] - 1), 0
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((8, 128), _c, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_buf, te, h_dim), xsg.dtype),
            pltpu.VMEM((n_buf, te, de), v.dtype),
            pltpu.VMEM((n_buf, win_r, h_dim), xr.dtype),
            pltpu.VMEM((2, te, de), v.dtype),
            pltpu.SemaphoreType.DMA((n_buf, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _kernel, tile_receivers=tr, win_r=win_r, n_buf=n_buf,
        activation=activation,
    )
    vout, agg, stats = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((e_pad, de), v.dtype),
            jax.ShapeDtypeStruct((r_pad, de), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nc * te * (h_dim * de * 2 + win_r * h_dim + tr * de),
            bytes_accessed=nc * te * (2 * h_dim + 2 * de)
            * v.dtype.itemsize,
            transcendentals=nc * te * h_dim,
        ),
    )(sched_base, sched_tile, sched_lo, sched_hi, sched_rwin,
      xsg, v, xr_p, sched_recv.reshape(nc, 1, te), mask_sched,
      w1e_eff, w2,
      b_eff.reshape(1, h_dim), b2.reshape(1, de),
      jnp.stack([a, c]).astype(jnp.float32))
    return (
        vout,
        agg[:num_receivers].astype(v.dtype),
        stats[:3, 0],
    )
