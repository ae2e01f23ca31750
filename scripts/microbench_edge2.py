"""Microbench v2: per-op costs with the per-dispatch tunnel overhead
amortized INSIDE one jitted program (K data-dependent repeats of each piece
per dispatch), plus a null program to measure the dispatch floor itself.

Reported per-op ms = (t(K) - t(null)) / K from a single program; see
scripts/microbench_edge.py for the un-amortized variant that motivated this
(standalone pieces were floor-bound at ~3 ms).

Usage:  python scripts/microbench_edge2.py [piece ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 8  # inner repeats per dispatch


def _sync(x):
    import jax
    import jax.numpy as jnp

    leaf = jax.tree.leaves(x)[0]
    return float(jnp.float32(leaf.ravel()[0]))


def _timeit(fn, args, iters=8, bump_idx=0):
    import jax

    t0 = time.time()
    out = fn(*args)
    _sync(out)
    compile_s = time.time() - t0

    def bump(args, out):
        leaf = jax.tree.leaves(out)[0]
        a = list(args)
        a[bump_idx] = a[bump_idx] + (leaf.ravel()[0] * 1e-12).astype(
            a[bump_idx].dtype
        )
        return tuple(a)

    args = bump(args, out)
    out = fn(*args)
    args = bump(args, out)
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        args = bump(args, out)
    _sync(out)
    ms = (time.time() - t0) / iters * 1e3
    return round(compile_s, 1), round(ms, 3)


def main():
    import jax
    import jax.numpy as jnp

    from graphcast_lite_tpu import presets
    from graphcast_lite_tpu.graphs.build import build_graph_set
    from graphcast_lite_tpu.models.nn import PyGLayerNorm
    from graphcast_lite_tpu.ops.pallas_segment import segment_sum_sorted
    from graphcast_lite_tpu.ops.pallas_edge_mlp import edge_mlp_segment

    want = set(sys.argv[1:])

    def on(name):
        return not want or name in want

    lat, lon = presets.wb2_512x256_grid()
    gs = build_graph_set(lat, lon, [4, 6], 0.6)
    graph = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
        gs.processing,
    )
    m = graph.num_nodes
    e = graph.padded_num_edges
    h = 256
    rng = np.random.RandomState(0)
    bf = jnp.bfloat16
    x = jnp.asarray(rng.randn(m, h), dtype=bf)
    v = jnp.asarray(rng.randn(e, h), dtype=bf)
    w = jnp.asarray(rng.randn(h, h) * 0.06, dtype=bf)
    b = jnp.asarray(rng.randn(h) * 0.1, dtype=bf)
    res = {}

    def rep_edge(piece):
        """K repeats of a piece, chained through an [E,H] carrier so no
        repeat can be CSE'd away or reordered."""
        def fn(v, *rest):
            out = v
            for _ in range(K):
                y = piece(out, *rest)
                # fold y back into the [E,H] carrier, whatever its shape
                out = out + jax.tree.leaves(y)[0].ravel()[0].astype(bf) * 1e-12
            return out
        return fn

    # The fold above costs one [E,H] add per repeat; measure that add alone
    # as the null and subtract.
    def null(v):
        out = v
        for _ in range(K):
            out = out + out.ravel()[0] * 1e-12
        return out

    c, ms_null = _timeit(jax.jit(null), (v,))
    res["null"] = ms_null
    print(f"null ({K} [E,H] adds + floor): {ms_null:.3f} ms (compile {c}s)")
    per_add = None  # reported raw; interpretation below

    def timed(name, piece, *rest, bump_idx=0):
        f = jax.jit(rep_edge(piece))
        c, ms = _timeit(f, (v,) + rest, bump_idx=bump_idx)
        per = (ms - ms_null) / K
        res[name] = round(per, 3)
        print(f"{name:>18}: {per:8.3f} ms/op  (raw {ms:.2f}, compile {c}s)")

    if on("ep"):
        timed("ep_matmul", lambda v: v @ w)
    if on("gather_s"):
        timed("gather_senders",
              lambda v: jnp.take(x * (1 + v.ravel()[0] * 1e-12),
                                 graph.senders, axis=0))
    if on("h_pre"):
        def h_pre(v):
            xs = x @ w
            xr = x @ w
            return (jnp.take(xs, graph.senders, axis=0)
                    + jnp.take(xr, graph.receivers, axis=0) + v @ w + b)
        timed("h_pre_chain", h_pre)
    if on("act_w2"):
        timed("act_w2", lambda v: jax.nn.silu(v) @ w + b)
    if on("seg"):
        timed("pallas_segment", lambda v: segment_sum_sorted(
            v, graph.receivers, graph.seg_chunk_base, graph.seg_chunk_tile,
            graph.num_receivers, graph.seg_tile_receivers, False))
    if on("mask_seg"):
        timed("mask_then_segment", lambda v: segment_sum_sorted(
            v * graph.edge_mask[:, None], graph.receivers,
            graph.seg_chunk_base, graph.seg_chunk_tile,
            graph.num_receivers, graph.seg_tile_receivers, False))
    if on("xla_seg"):
        timed("xla_segment", lambda v: jax.ops.segment_sum(
            v * graph.edge_mask[:, None], graph.receivers,
            num_segments=graph.num_receivers, indices_are_sorted=True))
    if on("mega"):
        timed("mega_edge_mlp", lambda v: edge_mlp_segment(
            v, w, b, graph.edge_mask, graph.receivers,
            graph.seg_chunk_base, graph.seg_chunk_tile,
            graph.num_receivers, graph.seg_tile_receivers,
            activation="swish", interpret=False))
    if on("act_w2_seg"):  # the unfused tail the mega kernel replaces
        def tail(v):
            u = jax.nn.silu(v) @ w + b
            agg = segment_sum_sorted(
                u * graph.edge_mask[:, None], graph.receivers,
                graph.seg_chunk_base, graph.seg_chunk_tile,
                graph.num_receivers, graph.seg_tile_receivers, False)
            return (u, agg)
        timed("tail_unfused", tail)
    if on("ln_g"):
        ln = PyGLayerNorm(mode="graph")
        p = ln.init(jax.random.PRNGKey(0), v, graph.edge_mask)
        timed("edge_ln_graph", lambda v: ln.apply(p, v, graph.edge_mask))
    if on("resid_ln"):
        ln = PyGLayerNorm(mode="graph")
        p = ln.init(jax.random.PRNGKey(0), v, graph.edge_mask)
        timed("edge_resid_ln", lambda v: ln.apply(p, v + v, graph.edge_mask))

    print("JSON", json.dumps(res))


if __name__ == "__main__":
    main()
