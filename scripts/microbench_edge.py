"""Microbenchmarks of the InteractionNet processor step's constituent ops
at flagship scale (512x256 / mesh [4,6]: M=40962 mesh nodes, E=261120
multimesh edges, hidden = edge latent = 256, bf16).

Purpose: attribute the measured ~4.8 ms/MP-step (57.6 ms / 12 steps,
BENCH_r03) to individual ops so kernel work targets the real cost, not the
modeled one.  Each piece is its own jitted program; timings are
tunnel-honest (chained data-dependent args, one fetch at the end —
see bench.py _sync).

Usage:  python scripts/microbench_edge.py [piece ...]
        (no args = all pieces)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax
    import jax.numpy as jnp

    leaf = jax.tree.leaves(x)[0]
    return float(jnp.float32(leaf.ravel()[0]))


def _timeit(fn, args, iters=16, bump_idx=0):
    """fn(*args) -> out (array or tuple).  Chains a tiny data-dependent bump
    into args[bump_idx] between calls."""
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
    out = fn(*args)          # re-warm device-produced-layout signature
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
    from graphcast_lite_tpu.models.gnn import InteractionNetLayer
    from graphcast_lite_tpu.models.nn import PyGLayerNorm
    from graphcast_lite_tpu.ops.pallas_segment import segment_sum_sorted

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
    v = jnp.asarray(rng.randn(e, h), dtype=bf)      # edge latents
    hp = jnp.asarray(rng.randn(e, h), dtype=bf)     # h_pre stand-in
    w = jnp.asarray(rng.randn(h, h) * 0.06, dtype=bf)
    b = jnp.asarray(rng.randn(h) * 0.1, dtype=bf)
    res = {}

    nbytes = e * h * 2 / 1e6
    print(f"# E={e} M={m} H={h}  edge tensor = {nbytes:.0f} MB bf16")

    if on("ep"):  # one [E,H]@[H,H] matmul, read 134 write 134
        f = jax.jit(lambda v, w: v @ w)
        res["ep_matmul"] = _timeit(f, (v, w))
    if on("gather_s"):  # random gather of E rows from the [M,H] table
        f = jax.jit(lambda x, s: jnp.take(x, s, axis=0))
        res["gather_senders"] = _timeit(f, (x, graph.senders))
    if on("gather_r"):  # receiver gather (sorted -> segment-expand)
        f = jax.jit(lambda x, r: jnp.take(x, r, axis=0))
        res["gather_receivers"] = _timeit(f, (x, graph.receivers))
    if on("h_pre"):  # the full first-layer chain as the model runs it
        def h_pre(x, v, w, b):
            xs = x @ w
            xr = x @ w
            return (jnp.take(xs, graph.senders, axis=0)
                    + jnp.take(xr, graph.receivers, axis=0)
                    + v @ w + b)
        res["h_pre_chain"] = _timeit(jax.jit(h_pre), (x, v, w, b))
    if on("act_w2"):  # second edge-MLP layer
        f = jax.jit(lambda hp, w, b: jax.nn.silu(hp) @ w + b)
        res["act_w2"] = _timeit(f, (hp, w, b))
    if on("seg"):  # Pallas sorted-segment alone (pre-masked input)
        f = jax.jit(lambda u: segment_sum_sorted(
            u, graph.receivers, graph.seg_chunk_base, graph.seg_chunk_tile,
            graph.num_receivers, graph.seg_tile_receivers, False))
        res["pallas_segment"] = _timeit(f, (v,))
    if on("mask_seg"):  # the current combo: mask-multiply THEN kernel
        f = jax.jit(lambda u: segment_sum_sorted(
            u * graph.edge_mask[:, None], graph.receivers,
            graph.seg_chunk_base, graph.seg_chunk_tile,
            graph.num_receivers, graph.seg_tile_receivers, False))
        res["mask_then_segment"] = _timeit(f, (v,))
    if on("ln_g"):  # masked graph-mode LayerNorm over the edge tensor
        ln = PyGLayerNorm(mode="graph")
        p = ln.init(jax.random.PRNGKey(0), v, graph.edge_mask)
        f = jax.jit(lambda p, v: ln.apply(p, v, graph.edge_mask))
        res["edge_ln_graph"] = _timeit(f, (p, v), bump_idx=1)
    if on("resid_ln"):  # residual + LN as the step runs it
        ln = PyGLayerNorm(mode="graph")
        p = ln.init(jax.random.PRNGKey(0), v, graph.edge_mask)
        f = jax.jit(lambda p, ea, u: ln.apply(p, ea + u, graph.edge_mask))
        res["edge_resid_ln"] = _timeit(f, (p, v, hp), bump_idx=1)
    if on("instep"):  # one full InteractionNetLayer (inference trace)
        layer = InteractionNetLayer(node_dim=h, edge_dim=h, hidden_dim=h,
                                    activation="swish")
        p = jax.jit(layer.init)(jax.random.PRNGKey(0), x, v, graph)
        p = jax.tree.map(lambda a: a.astype(bf)
                         if a.dtype == jnp.float32 else a, p)
        f = jax.jit(lambda p, x, v: layer.apply(p, x, v, graph))
        res["in_step_full"] = _timeit(f, (p, x, v), bump_idx=1)
    if on("node_mlp"):  # node-side two-layer MLP + node LN
        w2h = jnp.asarray(rng.randn(2 * h, h) * 0.06, dtype=bf)
        ln = PyGLayerNorm(mode="node")
        p = ln.init(jax.random.PRNGKey(0), x)

        def node_side(p, x, agg):
            hcat = jnp.concatenate([x, agg], axis=-1)
            u = jax.nn.silu(hcat @ w2h) @ w + b
            return ln.apply(p, x + u)
        res["node_mlp_ln"] = _timeit(jax.jit(node_side), (p, x, x),
                                     bump_idx=1)

    for k, (c, ms) in res.items():
        print(f"{k:>18}: {ms:8.3f} ms   (compile {c}s)")
    print("JSON", json.dumps({k: v[1] for k, v in res.items()}))


if __name__ == "__main__":
    main()
