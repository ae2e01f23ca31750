"""Parity tests for the Pallas sorted-segment-sum kernel (interpret mode on
CPU; the same code path compiles on TPU — see bench notes in the module)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphcast_lite_tpu.ops.pallas_segment import (
    build_schedule,
    build_tile_offsets,
    segment_sum_sorted,
)


def make_case(rng, e, r, f, e_pad=None):
    recv = np.sort(rng.randint(0, r, e)).astype(np.int32)
    e_pad = e_pad or ((e + 127) // 128) * 128
    m = np.zeros((e_pad, f), np.float32)
    m[:e] = rng.randn(e, f)
    r1 = np.full((e_pad,), r - 1, np.int32)
    r1[:e] = recv
    # Padded rows must carry zero messages (framework invariant).
    return m, r1


@pytest.mark.parametrize("e,r,f", [
    (1000, 300, 128),
    (5000, 1000, 128),
    (333, 700, 256),     # more receivers than edges (many empty segments)
    (4096, 256, 128),    # exactly one tile of receivers
    (20000, 300, 128),   # > N_BUF chunks per tile (deep-pipeline slot reuse)
])
def test_parity_vs_xla(rng, e, r, f):
    m, r1 = make_case(rng, e, r, f)
    base, tile = build_schedule(r1, r, 256)
    out = segment_sum_sorted(
        jnp.asarray(m), jnp.asarray(r1), jnp.asarray(base),
        jnp.asarray(tile), r, 256, interpret=True,
    )
    expect = jax.ops.segment_sum(jnp.asarray(m), jnp.asarray(r1),
                                 num_segments=r)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               atol=1e-4, rtol=1e-4)


def test_skewed_degrees(rng):
    """One receiver hogs most edges (crosses many chunk boundaries)."""
    r, f = 512, 128
    recv = np.concatenate([
        np.zeros(3000, np.int32),
        np.sort(rng.randint(1, r, 500)).astype(np.int32),
    ])
    e = len(recv)
    e_pad = ((e + 127) // 128) * 128
    m = np.zeros((e_pad, f), np.float32)
    m[:e] = rng.randn(e, f)
    r1 = np.full((e_pad,), r - 1, np.int32)
    r1[:e] = recv
    _, _, _, max_chunks = build_tile_offsets(r1, r, 256)
    assert max_chunks >= 3   # crosses many chunk boundaries
    base, tile = build_schedule(r1, r, 256)
    out = segment_sum_sorted(
        jnp.asarray(m), jnp.asarray(r1), jnp.asarray(base),
        jnp.asarray(tile), r, 256, interpret=True,
    )
    expect = jax.ops.segment_sum(jnp.asarray(m), jnp.asarray(r1),
                                 num_segments=r)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               atol=1e-3, rtol=1e-4)


def test_aggregate_sum_pallas_flag_round_trip(rng, monkeypatch):
    """aggregate_sum must give identical results with the kernel forced on
    (interpret-mode via CPU fallback is exercised through the env flag)."""
    from graphcast_lite_tpu.graphs.structure import build_graph
    from graphcast_lite_tpu.ops import segment as seg

    s = rng.randint(0, 40, 200)
    r = rng.randint(0, 40, 200)
    g = build_graph(s, r, num_nodes=40, pad_multiple=128)
    msgs = jnp.asarray(rng.randn(g.padded_num_edges, 128).astype(np.float32))

    monkeypatch.setenv("GCLT_PALLAS_SEGMENT", "0")
    off = np.asarray(seg.aggregate_sum(msgs, g))
    assert g.seg_chunk_base is not None  # schedule built for every graph
    np.testing.assert_allclose(
        off,
        np.asarray(jax.ops.segment_sum(
            msgs * g.edge_mask[:, None], g.receivers,
            num_segments=g.num_receivers, indices_are_sorted=True,
        )),
        atol=1e-5,
    )


@pytest.mark.parametrize("b", [2, 3, 4, 8])
def test_vmap_batching_rule(rng, b):
    """vmap over the batch axis folds into the feature axis (or falls back
    to lax.map for odd batches); fwd and grad must match per-sample calls
    EXACTLY (the fold reshapes, it does not re-associate sums)."""
    e, r, f = 4096, 512, 128
    m, r1 = make_case(rng, e, r, f)
    base, tile = build_schedule(r1, r, 256)
    args = (jnp.asarray(r1), jnp.asarray(base), jnp.asarray(tile))

    def one(msgs):
        return segment_sum_sorted(msgs, *args, r, 256, True)

    msgs = jnp.asarray(rng.randn(b, m.shape[0], f).astype(np.float32))
    out = jax.vmap(one)(msgs)
    ref = np.stack([np.asarray(one(msgs[i])) for i in range(b)])
    np.testing.assert_array_equal(np.asarray(out), ref)

    g = jax.grad(lambda x: (jax.vmap(one)(x) ** 2).sum())(msgs)
    gref = np.stack([
        np.asarray(jax.grad(lambda x: (one(x) ** 2).sum())(msgs[i]))
        for i in range(b)
    ])
    np.testing.assert_array_equal(np.asarray(g), gref)


def test_vmap_grouping_respects_vmem_budget():
    """Wide folds split into groups: B=8 x F=512 f32 exceeds the scratch
    budget for a single fold, so the rule must group (and still be exact)."""
    rng = np.random.RandomState(3)
    e, r, f, b = 2048, 256, 512, 8
    m, r1 = make_case(rng, e, r, f)
    base, tile = build_schedule(r1, r, 256)
    args = (jnp.asarray(r1), jnp.asarray(base), jnp.asarray(tile))

    def one(msgs):
        return segment_sum_sorted(msgs, *args, r, 256, True)

    msgs = jnp.asarray(rng.randn(b, m.shape[0], f).astype(np.float32))
    out = jax.vmap(one)(msgs)
    ref = np.stack([np.asarray(one(msgs[i])) for i in range(b)])
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_clipped_band_parity(rng):
    """Bipartite-style receiver distributions (all receivers in a narrow
    band of a large target space): the clipped schedule must skip the
    empty-tile chunks and return exact zeros outside the band."""
    from graphcast_lite_tpu.ops.pallas_segment import build_schedule_clipped

    e, r, f = 5000, 4000, 128
    recv = np.sort(rng.randint(1100, 1900, e)).astype(np.int32)  # mid band
    e_pad = ((e + 127) // 128) * 128
    m = np.zeros((e_pad, f), np.float32)
    m[:e] = rng.randn(e, f)
    r1 = np.full((e_pad,), recv[-1], np.int32)   # padding INSIDE the band
    r1[:e] = recv
    base, tile, t_lo, t_hi = build_schedule_clipped(r1, r, 256)
    assert t_lo >= 4 and t_hi <= 8, (t_lo, t_hi)   # band clipped
    out = segment_sum_sorted(
        jnp.asarray(m), jnp.asarray(r1), jnp.asarray(base),
        jnp.asarray(tile), r, 256, interpret=True,
        tile_lo=t_lo, tile_hi=t_hi,
    )
    assert out.shape == (r, f)
    expect = jax.ops.segment_sum(jnp.asarray(m), jnp.asarray(r1),
                                 num_segments=r)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               atol=1e-4, rtol=1e-4)
    # rows outside the band are exact zeros
    assert np.all(np.asarray(out[: t_lo * 256]) == 0)
    assert np.all(np.asarray(out[t_hi * 256:]) == 0)


def test_clipped_band_through_graph(rng):
    """build_graph's clipped schedule + seg_recv repointing: a bipartite
    graph (receivers in the upper node band) aggregates correctly through
    ops.segment.aggregate_sum's kernel path."""
    import os

    from graphcast_lite_tpu.graphs.structure import build_graph
    from graphcast_lite_tpu.ops import segment as seg_ops

    n, e = 4000, 20000
    s = rng.randint(0, 1000, e)           # senders low band
    r = rng.randint(3000, 4000, e)        # receivers upper band
    g = build_graph(s, r, num_nodes=n, build_ell=False, pad_multiple=128)
    assert g.seg_tile_lo >= 11, g.seg_tile_lo
    msgs = jnp.asarray(rng.randn(g.padded_num_edges, 128).astype(np.float32))
    os.environ["GCLT_PALLAS_SEGMENT"] = "1"
    try:
        out = seg_ops.aggregate_sum(msgs, g)
    finally:
        os.environ.pop("GCLT_PALLAS_SEGMENT", None)
    expect = jax.ops.segment_sum(
        msgs * g.edge_mask[:, None], g.receivers,
        num_segments=g.num_receivers, indices_are_sorted=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               atol=1e-3, rtol=1e-3)
