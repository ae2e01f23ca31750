"""Pallas TPU mega-kernel: second edge-MLP layer fused into the segment
aggregation.

The InteractionNet step tail

    edge_update = act(h_pre) @ W2 + b2          # [E, De]
    agg_sum     = segment_sum(edge_update * mask, receivers)

costs three extra [E, De] HBM round trips when composed from XLA ops + the
sorted-segment kernel: XLA writes ``edge_update``, materializes the masked
copy (``pallas_call`` operands are real arrays), and the kernel reads it
back.  This kernel does the whole tail in ONE pass over ``h_pre``:

    per edge chunk (the flat chunk schedule of ``ops.pallas_segment``):
      DMA h_pre chunk -> VMEM
      u   = act(h) @ W2 + b2        (MXU, W2 resident in VMEM)
      write u to the edge_update output block
      acc += OneHot[TR, TE] @ (u * mask_chunk)   (the one-hot segment trick)

so the only [E, ·] traffic left is: read h_pre once, write edge_update once.
The chunk schedule, alignment rules, DMA pipelining, empty-tile dummies and
revisited-output accumulation are exactly those of
``ops.pallas_segment`` (see its module docstring); overlap chunks at tile
boundaries recompute/rewrite identical ``edge_update`` rows (idempotent).

No autodiff rule: callers are either forward-only traces (inference
rollouts) or the *inside* of a ``custom_vjp`` forward (``ops.fused_edge``),
whose closed-form backward never differentiates through this call.

Parity oracle: ``act(h) @ w2 + b2`` / ``jax.ops.segment_sum`` — tested in
interpret mode on CPU (tests/test_pallas_edge_mlp.py).

Replaces the hot-path tail of the reference's InteractionNetLayer
(reference src/models.py:206-236, PyG scatter) in TPU-native form.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_segment import TILE_EDGES

__all__ = ["edge_mlp_segment", "supports_edge_mlp_segment"]

_N_BUF = 8
_SCRATCH_BUDGET_BYTES = 6 * 1024 * 1024


def _act(name: str, x):
    if name in ("swish", "silu"):
        return jax.nn.silu(x)
    if name == "relu":
        return jnp.maximum(x, 0.0)
    raise ValueError(f"unsupported fused activation: {name}")


def supports_edge_mlp_segment(graph, hidden_dim: int, out_dim: int,
                              activation: str) -> bool:
    """Shape/layout gate (callers add their own trace-phase policy)."""
    return (
        graph.seg_chunk_base is not None
        and activation in ("swish", "silu", "relu")
        and hidden_dim % 128 == 0
        and out_dim % 128 == 0
        and graph.num_edges >= 16384
    )


def _kernel(
    base_ref,        # scalar prefetch: [NC] int32 chunk base (TE-aligned)
    tile_ref,        # scalar prefetch: [NC] int32 owning receiver tile
    hpre_ref,        # HBM: [E_ext, H]
    recv_ref,        # HBM: [E_ext // TE, 1, TE] int32
    mask_ref,        # HBM: [E_ext // TE, 1, TE] float32 mask (32-bit so the
                     # size-1 middle dim respects Mosaic sublane tiling)
    w2_ref,          # VMEM: [H, De]
    b2_ref,          # VMEM: [1, De]
    u_ref,           # VMEM out block: [TE, De] (indexed by chunk base)
    agg_ref,         # VMEM out block: [TR, De] float32 (revisited per tile)
    h_scratch,       # VMEM: [N_BUF, TE, H]
    recv_scratch,    # VMEM: [N_BUF, 1, TE] int32
    mask_scratch,    # VMEM: [N_BUF, 1, TE]
    sems,            # DMA semaphores [N_BUF, 3]
    *,
    tile_receivers: int,
    n_buf: int,
    activation: str,
):
    i = pl.program_id(0)
    nc = pl.num_programs(0)
    tr, te = tile_receivers, TILE_EDGES
    # Negative tile ids mark inert chunks (see ops.pallas_segment).
    t_enc = tile_ref[i]
    t_dec = jnp.maximum(t_enc, -t_enc - 1)
    live = (t_enc >= 0).astype(jnp.float32)
    r0 = t_dec * tr

    def make_dma(slot, chunk_idx):
        base = pl.multiple_of(base_ref[chunk_idx], TILE_EDGES)
        return (
            pltpu.make_async_copy(
                hpre_ref.at[pl.ds(base, te), :],
                h_scratch.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                recv_ref.at[base // te],
                recv_scratch.at[slot],
                sems.at[slot, 1],
            ),
            pltpu.make_async_copy(
                mask_ref.at[base // te],
                mask_scratch.at[slot],
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

    h = h_scratch[slot]                               # [TE, H]
    a = _act(activation, h.astype(jnp.float32))
    u_f32 = (
        jax.lax.dot_general(
            a.astype(h.dtype),
            w2_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b2_ref[0, :].astype(jnp.float32)
    )                                                  # [TE, De]
    u = u_f32.astype(u_ref.dtype)
    u_ref[:] = u

    rows = jax.lax.broadcasted_iota(jnp.int32, (tr, te), 0)
    local = recv_scratch[slot, 0, :].reshape(1, te) - r0
    # The edge mask rides in the one-hot (0/1 · 0/1 stays exact in bf16, and
    # a [1, te] lane-major broadcast avoids the unsupported bf16 [te, 1]
    # relayout of masking the messages directly).
    mvec = mask_scratch[slot, 0, :].reshape(1, te) * live
    onehot = (
        jnp.where(rows == local, 1.0, 0.0) * mvec
    ).astype(jnp.bfloat16)

    def oh_dot(m):
        return jax.lax.dot_general(
            onehot, m,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if u.dtype == jnp.float32:
        hi = u.astype(jnp.bfloat16)
        lo = (u - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = oh_dot(hi) + oh_dot(lo)
    else:
        acc = oh_dot(u)

    prev = tile_ref[jnp.maximum(i - 1, 0)]
    prev_dec = jnp.maximum(prev, -prev - 1)
    is_first = jnp.logical_or(i == 0, prev_dec != t_dec)

    @pl.when(is_first)
    def _():
        agg_ref[:] = acc

    @pl.when(jnp.logical_not(is_first))
    def _():
        agg_ref[:] += acc

    @pl.when(i + n_buf < nc)
    def _():
        for d in make_dma(slot, i + n_buf):
            d.start()


@functools.partial(
    jax.jit,
    static_argnames=("num_receivers", "tile_receivers", "activation",
                     "interpret"),
)
def edge_mlp_segment(
    h_pre: jnp.ndarray,           # [E_pad, H], receiver-sorted rows
    w2: jnp.ndarray,              # [H, De]
    b2: jnp.ndarray,              # [De]
    mask: jnp.ndarray,            # [E_pad] (padding + pruning)
    recv1d: jnp.ndarray,          # [E_pad] int32, sorted
    chunk_base: jnp.ndarray,      # [NC] int32 (TE-aligned)
    chunk_tile: jnp.ndarray,      # [NC] int32
    num_receivers: int,
    tile_receivers: int,
    activation: str = "swish",
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (edge_update [E_pad, De] in h_pre dtype,
    agg_sum [num_receivers, De] in h_pre dtype, f32-accumulated)."""
    e_pad, h_dim = h_pre.shape
    de = w2.shape[1]
    tr, te = tile_receivers, TILE_EDGES
    ntiles = (num_receivers + tr - 1) // tr
    r_pad = ntiles * tr
    nc = chunk_base.shape[0]
    per_slot = te * (h_dim + 1) * h_pre.dtype.itemsize
    n_buf = int(np.clip(_SCRATCH_BUDGET_BYTES // per_slot, 2, _N_BUF))

    # Whole-chunk rounding only; aligned inputs (the flagship graphs) are
    # consumed zero-copy — dummy chunks are suppressed by their negative
    # tile id rather than by extension rows.
    e_ext = max((e_pad + te - 1) // te, 1) * te
    if e_ext != e_pad:
        hpre_x = jnp.pad(h_pre, ((0, e_ext - e_pad), (0, 0)))
        recv_x = jnp.pad(recv1d, (0, e_ext - e_pad), constant_values=-1)
    else:
        hpre_x, recv_x = h_pre, recv1d
    mask_x = jnp.pad(mask.astype(jnp.float32), (0, e_ext - e_pad))
    recv2d = recv_x.reshape(e_ext // te, 1, te)
    mask2d = mask_x.reshape(e_ext // te, 1, te)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (h_dim, de),
                lambda i, base_ref, tile_ref: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, de),
                lambda i, base_ref, tile_ref: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (te, de),
                lambda i, base_ref, tile_ref: (base_ref[i] // TILE_EDGES, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tr, de),
                # decode negative (inert) tile ids: -(t+1) -> t
                lambda i, base_ref, tile_ref: (
                    jnp.maximum(tile_ref[i], -tile_ref[i] - 1), 0
                ),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_buf, te, h_dim), h_pre.dtype),
            pltpu.VMEM((n_buf, 1, te), jnp.int32),
            pltpu.VMEM((n_buf, 1, te), jnp.float32),
            pltpu.SemaphoreType.DMA((n_buf, 3)),
        ],
    )
    kernel = functools.partial(
        _kernel, tile_receivers=tr, n_buf=n_buf, activation=activation
    )
    u, agg = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((e_ext, de), h_pre.dtype),
            jax.ShapeDtypeStruct((r_pad, de), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nc * te * de * (h_dim + tr),
            bytes_accessed=nc * te * (h_dim + de) * h_pre.dtype.itemsize
            + r_pad * de * 4,
            transcendentals=nc * te * h_dim,
        ),
    )(chunk_base, chunk_tile, hpre_x, recv2d, mask2d, w2,
      b2.reshape(1, de))
    return u[:e_pad], agg[:num_receivers].astype(h_pre.dtype)
