"""Parity tests for the fused edge-MLP + segment mega-kernel (interpret
mode on CPU; the same code path compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphcast_lite_tpu.ops.pallas_edge_mlp import edge_mlp_segment
from graphcast_lite_tpu.ops.pallas_segment import build_schedule


def make_case(rng, e, r, h, de, e_pad=None):
    recv = np.sort(rng.randint(0, r, e)).astype(np.int32)
    e_pad = e_pad or ((e + 127) // 128) * 128
    hp = rng.randn(e_pad, h).astype(np.float32)
    r1 = np.full((e_pad,), r - 1, np.int32)
    r1[:e] = recv
    mask = np.zeros((e_pad,), np.float32)
    mask[:e] = 1.0
    # prune a few real edges too (SparseGAT-style runtime mask)
    mask[: e // 7] = 0.0
    w2 = (rng.randn(h, de) * 0.1).astype(np.float32)
    b2 = (rng.randn(de) * 0.1).astype(np.float32)
    return hp, r1, mask, w2, b2


@pytest.mark.parametrize("e,r,h,de,act", [
    (1000, 300, 128, 128, "swish"),
    (5000, 1000, 256, 128, "relu"),
    (4096, 256, 128, 256, "swish"),   # exactly one tile of receivers
    (20000, 300, 128, 128, "swish"),  # > N_BUF chunks per tile
])
def test_parity_vs_xla(rng, e, r, h, de, act):
    hp, r1, mask, w2, b2 = make_case(rng, e, r, h, de)
    base, tile = build_schedule(r1, r, 256)
    u, agg = edge_mlp_segment(
        jnp.asarray(hp), jnp.asarray(w2), jnp.asarray(b2), jnp.asarray(mask),
        jnp.asarray(r1), jnp.asarray(base), jnp.asarray(tile),
        r, 256, activation=act, interpret=True,
    )
    actf = jax.nn.silu if act == "swish" else jax.nn.relu
    u_ref = actf(jnp.asarray(hp)) @ w2 + b2
    agg_ref = jax.ops.segment_sum(
        u_ref * mask[:, None], jnp.asarray(r1), num_segments=r
    )
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(agg), np.asarray(agg_ref),
                               atol=1e-3, rtol=1e-3)


def test_bf16_inputs(rng):
    e, r, h, de = 3000, 500, 128, 128
    hp, r1, mask, w2, b2 = make_case(rng, e, r, h, de)
    base, tile = build_schedule(r1, r, 256)
    u, agg = edge_mlp_segment(
        jnp.asarray(hp, jnp.bfloat16), jnp.asarray(w2, jnp.bfloat16),
        jnp.asarray(b2, jnp.bfloat16), jnp.asarray(mask, jnp.bfloat16),
        jnp.asarray(r1), jnp.asarray(base), jnp.asarray(tile),
        r, 256, activation="swish", interpret=True,
    )
    assert u.dtype == jnp.bfloat16 and agg.dtype == jnp.bfloat16
    u_ref = jax.nn.silu(hp) @ w2 + b2
    agg_ref = jax.ops.segment_sum(u_ref * mask[:, None], jnp.asarray(r1),
                                  num_segments=r)
    np.testing.assert_allclose(
        np.asarray(u, np.float32), u_ref, atol=0.05, rtol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(agg, np.float32), np.asarray(agg_ref), atol=0.3, rtol=0.05
    )


def test_real_graph_structure(rng, small_graph_set):
    """The multimesh graph's actual schedule (incl. empty padding tiles)."""
    g = small_graph_set.processing
    h = de = 128
    e_pad = g.padded_num_edges
    hp = rng.randn(e_pad, h).astype(np.float32)
    w2 = (rng.randn(h, de) * 0.1).astype(np.float32)
    b2 = np.zeros(de, np.float32)
    u, agg = edge_mlp_segment(
        jnp.asarray(hp), jnp.asarray(w2), jnp.asarray(b2), g.edge_mask,
        g.receivers, g.seg_chunk_base, g.seg_chunk_tile,
        g.num_receivers, g.seg_tile_receivers, activation="swish",
        interpret=True,
    )
    u_ref = jax.nn.silu(jnp.asarray(hp)) @ w2 + b2
    agg_ref = jax.ops.segment_sum(
        u_ref * g.edge_mask[:, None], g.receivers,
        num_segments=g.num_receivers, indices_are_sorted=True,
    )
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(agg), np.asarray(agg_ref),
                               atol=1e-3, rtol=1e-3)
