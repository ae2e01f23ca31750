"""Custom-VJP edge unit for the regular-block processor layout.

The constant-degree per-level layout (``graphs.structure.RegularBlocks``)
makes most of the InteractionNet edge step's adjoints STRUCTURAL:

  forward    u = act(take(xs, snd) + tile(xr) + v @ W1e' + b1') @ W2 + b2
             agg_sum = per-block k-slice sums of (u · mask)
  backward   d(agg)  -> tile-expand            (a broadcast, not a gather)
             d(xr)   -> per-block k-slice sum  (a reshape-sum, not a scatter)
             d(xs)   -> the ONE irreducible scatter, via the sender-sorted
                        Pallas segment kernel (aux precomputed at build)

versus the COO custom VJP (``ops.fused_edge``) whose d_xr needs a second
segment kernel and whose d_agg expand needs a receiver gather.  Saves
``h_pre`` like the COO default (``GCLT_FUSED_SAVE_HPRE`` policy) so the
backward never redoes the sender gather.

Cotangent hygiene: padded rows (mask 0) receive EXACT zero cotangents —
their ``u`` feeds only the padding tail of the edge carrier, which the
processor discards — so the sender scatter needs no extra masking.

Parity oracle: plain-autodiff gradients of the same composed expressions
(tests/test_gnn_parity.py::test_reg_edge_vjp_matches_autodiff).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .pallas_segment import segment_sum_sorted

__all__ = ["RegStatic", "reg_edge_tail"]


class RegStatic(NamedTuple):
    block_recv: Tuple[int, ...]
    block_k: Tuple[int, ...]
    num_nodes: int
    tile_receivers: int
    s_tile_lo: int
    s_tile_hi: int
    activation: str
    interpret: bool


def _act_fn(name: str):
    if name in ("swish", "silu"):
        return jax.nn.silu
    if name == "relu":
        return lambda x: jnp.maximum(x, 0.0)
    raise ValueError(name)


def _tile_expand(static: RegStatic, nodes: jnp.ndarray, rows_pad: int):
    """[M, F] node rows -> [rows_pad, F] block rows (slot-major tiles)."""
    parts = []
    for v_sz, k in zip(static.block_recv, static.block_k):
        parts.append(jnp.tile(nodes[:v_sz], (k, 1)))
    out = jnp.concatenate(parts, axis=0)
    if out.shape[0] < rows_pad:
        out = jnp.pad(out, ((0, rows_pad - out.shape[0]), (0, 0)))
    return out


def _slice_sum(static: RegStatic, rows: jnp.ndarray):
    """[rows_pad, F] block rows -> [M, F] per-receiver sums (f32 accum)."""
    m = static.num_nodes
    total = None
    off = 0
    for v_sz, k in zip(static.block_recv, static.block_k):
        blk = rows[off:off + v_sz].astype(jnp.float32)
        for s_i in range(1, k):
            blk = blk + rows[off + s_i * v_sz:
                             off + (s_i + 1) * v_sz].astype(jnp.float32)
        blk = blk.astype(rows.dtype)
        if v_sz < m:
            blk = jnp.pad(blk, ((0, m - v_sz), (0, 0)))
        total = blk if total is None else total + blk
        off += v_sz * k
    return total


def _fwd_impl(static, x, v, mask, snd, w1s, w1r, w1e_eff, b1_eff, w2, b2):
    act = _act_fn(static.activation)
    xs = x @ w1s
    xr = x @ w1r
    rows_pad = snd.shape[0]
    h_pre = (
        jnp.take(xs, snd, axis=0)
        + _tile_expand(static, xr, rows_pad)
        + v @ w1e_eff
        + b1_eff
    )
    u = act(h_pre) @ w2 + b2
    agg_sum = _slice_sum(static, u * mask[:, None].astype(u.dtype))
    return u, agg_sum, h_pre


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def reg_edge_tail(static: RegStatic, x, v, mask, snd, s_perm, s_sorted,
                  s_chunk_base, s_chunk_tile,
                  w1s, w1r, w1e_eff, b1_eff, w2, b2):
    """Returns (u [rows_pad, De], agg_sum [M, De]) — mask pre-applied to
    the aggregation only (the caller divides by the masked degree)."""
    u, agg_sum, _ = _fwd_impl(
        static, x, v, mask, snd, w1s, w1r, w1e_eff, b1_eff, w2, b2
    )
    return u, agg_sum


def _fwd(static, x, v, mask, snd, s_perm, s_sorted, s_chunk_base,
         s_chunk_tile, w1s, w1r, w1e_eff, b1_eff, w2, b2):
    u, agg_sum, h_pre = _fwd_impl(
        static, x, v, mask, snd, w1s, w1r, w1e_eff, b1_eff, w2, b2
    )
    return (u, agg_sum), (
        x, v, mask, snd, s_perm, s_sorted, s_chunk_base, s_chunk_tile,
        w1s, w1r, w1e_eff, w2, h_pre,
    )


def _bwd(static, res, cot):
    (x, v, mask, snd, s_perm, s_sorted, s_chunk_base, s_chunk_tile,
     w1s, w1r, w1e_eff, w2, h_pre) = res
    d_u, d_agg = cot
    act = _act_fn(static.activation)
    rows_pad = snd.shape[0]

    # d(agg_sum) enters u via the masked slice-sum: its adjoint is the
    # tile-expand (broadcast) times the mask.
    d_u_tot = d_u + mask[:, None].astype(d_u.dtype) * _tile_expand(
        static, d_agg, rows_pad
    )

    h, act_vjp = jax.vjp(act, h_pre)
    d_w2 = h.T @ d_u_tot
    d_b2 = d_u_tot.sum(axis=0)
    (d_hp,) = act_vjp(d_u_tot @ w2.T)       # [rows_pad, H]

    d_b1 = d_hp.sum(axis=0)
    d_v = d_hp @ w1e_eff.T
    d_w1e = v.T @ d_hp

    # Receiver side: slice-sum (the tile's adjoint).  Sender side: the one
    # irreducible scatter, through the sender-sorted Pallas kernel.
    d_xr_nodes = _slice_sum(static, d_hp)
    d_xs_nodes = segment_sum_sorted(
        jnp.take(d_hp, s_perm, axis=0), s_sorted,
        s_chunk_base, s_chunk_tile,
        static.num_nodes, static.tile_receivers, static.interpret,
        tile_lo=static.s_tile_lo, tile_hi=static.s_tile_hi,
    )
    d_x = d_xs_nodes @ w1s.T + d_xr_nodes @ w1r.T
    d_w1s = x.T @ d_xs_nodes
    d_w1r = x.T @ d_xr_nodes

    def int_zero(a):
        import numpy as np

        return np.zeros(a.shape, dtype=jax.dtypes.float0)

    return (d_x, d_v, jnp.zeros_like(mask), int_zero(snd),
            int_zero(s_perm), int_zero(s_sorted),
            int_zero(s_chunk_base), int_zero(s_chunk_tile),
            d_w1s, d_w1r, d_w1e, d_b1, d_w2, d_b2)


reg_edge_tail.defvjp(_fwd, _bwd)
