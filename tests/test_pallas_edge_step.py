"""Parity tests for the fused edge-step kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphcast_lite_tpu.ops.pallas_edge_step import (
    TILE_EDGES,
    build_step_schedule,
    edge_step_fused,
)


def make_case(rng, e, r, h, de, e_pad=None):
    recv = np.sort(rng.randint(0, r, e)).astype(np.int32)
    e_pad = e_pad or max(((e + 127) // 128) * 128, TILE_EDGES)
    r1 = np.full((e_pad,), r - 1, np.int32)
    r1[:e] = recv
    mask = np.zeros((e_pad,), np.float32)
    mask[:e] = 1.0
    mask[: e // 9] = 0.0  # some pruned real edges
    xsg = rng.randn(e_pad, h).astype(np.float32)
    v = rng.randn(e_pad, de).astype(np.float32)
    xr = rng.randn(r, h).astype(np.float32)
    w1e = (rng.randn(de, h) * 0.1).astype(np.float32)
    beff = (rng.randn(h) * 0.1).astype(np.float32)
    w2 = (rng.randn(h, de) * 0.1).astype(np.float32)
    b2 = (rng.randn(de) * 0.1).astype(np.float32)
    a = (1.0 + 0.1 * rng.randn(de)).astype(np.float32)
    c = (0.1 * rng.randn(de)).astype(np.float32)
    return xsg, v, xr, w1e, beff, w2, b2, a, c, mask, r1


def oracle(xsg, v, xr, w1e, beff, w2, b2, a, c, mask, recv, r):
    h = xsg + jnp.take(jnp.asarray(xr), jnp.asarray(recv), axis=0) \
        + v @ w1e + beff
    u = jax.nn.silu(h) @ w2 + b2
    vout = a[None, :] * v + c[None, :] + u
    agg = jax.ops.segment_sum(u * mask[:, None], jnp.asarray(recv),
                              num_segments=r)
    w = mask[:, None]
    sm = (vout * w).sum()
    sq = (jnp.square(vout) * w).sum()
    cnt = w.sum() * 1.0
    return vout, agg, jnp.stack([sm, sq, cnt])


@pytest.mark.parametrize("e,r,h,de", [
    (5000, 700, 128, 128),
    (4000, 256, 128, 256),    # exactly one receiver tile
    (30000, 1000, 128, 128),  # deep pipeline, many tiles
])
def test_parity_vs_composed(rng, e, r, h, de):
    xsg, v, xr, w1e, beff, w2, b2, a, c, mask, r1 = make_case(
        rng, e, r, h, de)
    sched = build_step_schedule(r1, r, 256)
    assert sched is not None
    vout, agg, stats = edge_step_fused(
        jnp.asarray(xsg), jnp.asarray(v), jnp.asarray(xr),
        jnp.asarray(w1e), jnp.asarray(beff), jnp.asarray(w2),
        jnp.asarray(b2), jnp.asarray(a), jnp.asarray(c), jnp.asarray(mask),
        jnp.asarray(sched.base), jnp.asarray(sched.tile),
        jnp.asarray(sched.win_lo), jnp.asarray(sched.win_hi),
        jnp.asarray(sched.rwin), jnp.asarray(sched.recv),
        r, 256, sched.win_r, sched.xr_rows,
        activation="swish", interpret=True,
    )
    vo, ao, so = oracle(jnp.asarray(xsg), jnp.asarray(v), xr, w1e, beff,
                        w2, b2, jnp.asarray(a), jnp.asarray(c),
                        jnp.asarray(mask), r1, r)
    np.testing.assert_allclose(np.asarray(vout), np.asarray(vo),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(agg), np.asarray(ao),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(stats), np.asarray(so),
                               rtol=1e-4)


def test_empty_tiles_and_windows(rng):
    """Receivers concentrated in few tiles: inert chunks must zero their
    blocks and contribute nothing to stats."""
    e, r, h, de = 3000, 2000, 128, 128
    recv = np.sort(rng.randint(900, 1100, e)).astype(np.int32)  # mid tiles
    e_pad = TILE_EDGES * 3
    r1 = np.full((e_pad,), r - 1, np.int32)
    r1[:e] = recv
    mask = np.zeros((e_pad,), np.float32)
    mask[:e] = 1.0
    xsg = rng.randn(e_pad, h).astype(np.float32)
    v = rng.randn(e_pad, de).astype(np.float32)
    xr = rng.randn(r, h).astype(np.float32)
    w1e = (rng.randn(de, h) * 0.1).astype(np.float32)
    z = np.zeros(h, np.float32)
    w2 = (rng.randn(h, de) * 0.1).astype(np.float32)
    a = np.ones(de, np.float32)
    c = np.zeros(de, np.float32)
    sched = build_step_schedule(r1, r, 256)
    vout, agg, stats = edge_step_fused(
        jnp.asarray(xsg), jnp.asarray(v), jnp.asarray(xr),
        jnp.asarray(w1e), jnp.asarray(z), jnp.asarray(w2),
        jnp.asarray(np.zeros(de, np.float32)), jnp.asarray(a),
        jnp.asarray(c), jnp.asarray(mask),
        jnp.asarray(sched.base), jnp.asarray(sched.tile),
        jnp.asarray(sched.win_lo), jnp.asarray(sched.win_hi),
        jnp.asarray(sched.rwin), jnp.asarray(sched.recv),
        r, 256, sched.win_r, sched.xr_rows,
        activation="swish", interpret=True,
    )
    vo, ao, so = oracle(jnp.asarray(xsg), jnp.asarray(v), xr, w1e,
                        jnp.asarray(z), w2,
                        jnp.asarray(np.zeros(de, np.float32)),
                        jnp.asarray(a), jnp.asarray(c),
                        jnp.asarray(mask), r1, r)
    np.testing.assert_allclose(np.asarray(agg), np.asarray(ao),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(stats), np.asarray(so),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(vout), np.asarray(vo),
                               atol=2e-4, rtol=2e-4)


def test_real_graph_schedule(rng, small_graph_set):
    g = small_graph_set.processing
    r = g.num_receivers
    e_pad = g.padded_num_edges
    if e_pad < TILE_EDGES:
        pytest.skip("graph smaller than one chunk")
    h = de = 128
    recv = np.asarray(g.receivers)
    sched = build_step_schedule(recv, r, 256)
    xsg = rng.randn(e_pad, h).astype(np.float32)
    v = rng.randn(e_pad, de).astype(np.float32)
    xr = rng.randn(r, h).astype(np.float32)
    w1e = (rng.randn(de, h) * 0.1).astype(np.float32)
    beff = (rng.randn(h) * 0.1).astype(np.float32)
    w2 = (rng.randn(h, de) * 0.1).astype(np.float32)
    b2 = (rng.randn(de) * 0.1).astype(np.float32)
    a = (1.0 + 0.1 * rng.randn(de)).astype(np.float32)
    c = (0.1 * rng.randn(de)).astype(np.float32)
    mask = np.asarray(g.edge_mask)
    vout, agg, stats = edge_step_fused(
        jnp.asarray(xsg), jnp.asarray(v), jnp.asarray(xr),
        jnp.asarray(w1e), jnp.asarray(beff), jnp.asarray(w2),
        jnp.asarray(b2), jnp.asarray(a), jnp.asarray(c), jnp.asarray(mask),
        jnp.asarray(sched.base), jnp.asarray(sched.tile),
        jnp.asarray(sched.win_lo), jnp.asarray(sched.win_hi),
        jnp.asarray(sched.rwin), jnp.asarray(sched.recv),
        r, 256, sched.win_r, sched.xr_rows,
        activation="swish", interpret=True,
    )
    vo, ao, so = oracle(jnp.asarray(xsg), jnp.asarray(v), xr, w1e, beff,
                        w2, b2, jnp.asarray(a), jnp.asarray(c),
                        jnp.asarray(mask), recv, r)
    np.testing.assert_allclose(np.asarray(vout), np.asarray(vo),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(agg), np.asarray(ao),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(stats), np.asarray(so),
                               rtol=1e-4)
