"""Microbench: segment-sum formulations at the 512x256 processor shape.

Paths:
  pallas  — ops.pallas_segment.segment_sum_sorted (one-hot MXU kernel)
  xla     — jax.ops.segment_sum(indices_are_sorted=True)
  ell     — dense [R, K] gather + einsum (K = max in-degree)
Also times one full InteractionNetLayer step fwd for composition.
"""

from __future__ import annotations

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


def main():
    import jax
    import jax.numpy as jnp

    from graphcast_lite_tpu import presets
    from graphcast_lite_tpu.graphs.build import build_graph_set
    from graphcast_lite_tpu.ops.pallas_segment import segment_sum_sorted

    cfgname = sys.argv[1] if len(sys.argv) > 1 else "512x256"
    if cfgname == "64x32":
        cfg = presets.interaction_net_64x32()
        lat, lon = presets.wb2_64x32_grid()
    else:
        cfg = presets.interaction_net_512x256()
        lat, lon = presets.wb2_512x256_grid()
    gs = build_graph_set(lat, lon, cfg.graph.mesh_levels,
                         cfg.graph.grid2mesh_radius_query)
    g = gs.processing
    e_pad, r = g.padded_num_edges, g.num_receivers
    f = 256
    print(f"proc: E_pad={e_pad} R={r} F={f} "
          f"n_chunks={int(g.seg_chunk_base.shape[0])} ELL_K={g.neigh_senders.shape[1]}")

    rng = np.random.RandomState(0)
    msgs = jnp.asarray(rng.randn(e_pad, f).astype(np.float32),
                       dtype=jnp.bfloat16)
    iters = 30

    def timeit(fn, x):
        out = fn(x)
        _sync(out)       # compile
        out = fn(x + out[:1, :1].reshape(()).astype(x.dtype) * 0)
        _sync(out)
        t0 = time.time()
        for _ in range(iters):
            x = x + out[:1, :1].reshape(()).astype(x.dtype) * 1e-12
            out = fn(x)
        _sync(out)
        return (time.time() - t0) / iters * 1e3

    bytes_moved = e_pad * f * 2 + r * f * 2
    # pallas kernel
    pal = jax.jit(lambda m: segment_sum_sorted(
        m, g.receivers, g.seg_chunk_base, g.seg_chunk_tile, r,
        g.seg_tile_receivers))
    ms = timeit(pal, msgs)
    print(f"pallas: {ms:.3f} ms  ({bytes_moved / ms / 1e6:.0f} GB/s eff)")

    # xla segment_sum
    xla = jax.jit(lambda m: jax.ops.segment_sum(
        m, g.receivers, num_segments=r, indices_are_sorted=True))
    ms = timeit(xla, msgs)
    print(f"xla:    {ms:.3f} ms  ({bytes_moved / ms / 1e6:.0f} GB/s eff)")

    # ELL: gather msgs by neigh_edge then masked sum over K
    ne = g.neigh_edge
    nm = g.neigh_mask.astype(jnp.bfloat16)
    rr, k = ne.shape

    def ell(m):
        rows = jnp.take(m, ne.reshape(-1), axis=0).reshape(rr, k, f)
        return jnp.einsum("rkf,rk->rf", rows, nm)

    ms = timeit(jax.jit(ell), msgs)
    ell_bytes = rr * k * f * 2 + r * f * 2
    print(f"ell:    {ms:.3f} ms  ({ell_bytes / ms / 1e6:.0f} GB/s eff, "
          f"{ell_bytes/1e6:.0f} MB)")

    # one InteractionNetLayer fwd for composition
    from graphcast_lite_tpu.models.gnn import InteractionNetLayer

    layer = InteractionNetLayer(node_dim=f, edge_dim=f, hidden_dim=f,
                                activation="swish", use_layer_norm=True)
    x = jnp.asarray(rng.randn(r, f).astype(np.float32), dtype=jnp.bfloat16)
    e_attr = jnp.asarray(rng.randn(e_pad, f).astype(np.float32),
                         dtype=jnp.bfloat16)
    params = jax.jit(layer.init)(jax.random.PRNGKey(0), x, e_attr, g)
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16)
                          if p.dtype == jnp.float32 else p, params)

    def step(xe):
        xx, ee = xe
        return layer.apply(params, xx, ee, g)

    def feed(xe, out):
        return (out[0].astype(jnp.bfloat16), out[1].astype(jnp.bfloat16))

    out = jax.jit(step)((x, e_attr))
    _sync(out)
    arg = feed(None, out)
    out = jax.jit(step)(arg)
    _sync(out)
    t0 = time.time()
    arg = feed(None, out)
    for _ in range(12):
        out = jax.jit(step)(arg)
        arg = feed(None, out)
    _sync(out)
    print(f"inet_layer_fwd: {(time.time() - t0) / 12 * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
