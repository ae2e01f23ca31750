"""Microbench the pieces of one InteractionNet processor step at the
512x256 workload (E=261120 mesh edges, M=40962 nodes, F=H=256), each as a
chained lax.scan dispatch (tunnel-safe timing; see bench_components.py).

Usage: python scripts/bench_step_pieces.py [bf16|f32] [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def scan_time(body, init, args, iters, label, bytes_moved=None):
    def fn_(c, *extra):
        def step(carry, _):
            return body(carry, *extra), None

        return jax.lax.scan(step, c, None, length=iters)[0]

    fn = jax.jit(fn_)
    out = fn(init, *args)
    _ = np.asarray(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    out = fn(out, *args)
    _ = np.asarray(jnp.ravel(out)[0])
    dt = (time.perf_counter() - t0) / iters
    bw = f"  {bytes_moved/dt/1e9:7.1f} GB/s" if bytes_moved else ""
    print(f"[{label:<22}] {dt*1e3:8.3f} ms{bw}")
    return dt


def main():
    dtype = jnp.bfloat16 if (len(sys.argv) < 2 or sys.argv[1] == "bf16") else jnp.float32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    bs = 2 if dtype == jnp.bfloat16 else 4

    from graphcast_lite_tpu import presets
    from graphcast_lite_tpu.graphs.build import build_graph_set

    cfg = presets.interaction_net_512x256()
    lat, lon = presets.wb2_512x256_grid()
    gs = build_graph_set(lat, lon, cfg.graph.mesh_levels,
                         cfg.graph.grid2mesh_radius_query)
    g_proc = gs.processing
    E = g_proc.padded_num_edges
    M = g_proc.num_nodes
    F = 256
    print(f"E={E} M={M} F={F} dtype={dtype.__name__}")

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, F)).astype(dtype)
    eattr = jnp.asarray(rng.randn(E, F)).astype(dtype)
    w = jnp.asarray(rng.randn(F, F) * 0.05).astype(dtype)
    mask = g_proc.edge_mask.astype(dtype)

    # 1) sender gather (unsorted row take)
    scan_time(
        lambda c, s: jnp.take(c, s, axis=0).sum(0, keepdims=True) * 1e-6 + c[:M],
        x, (g_proc.senders,), iters, "gather senders",
        bytes_moved=E * F * bs,
    )
    # 2) receiver gather (sorted row take)
    scan_time(
        lambda c, r: jnp.take(c, r, axis=0).sum(0, keepdims=True) * 1e-6 + c[:M],
        x, (g_proc.receivers,), iters, "gather receivers(sorted)",
        bytes_moved=E * F * bs,
    )
    # 3) dense edge-space matmul [E,F]@[F,F]
    scan_time(
        lambda c, ww: c @ ww * 0.01, eattr, (w,), iters, "edge matmul ExF@FxF",
        bytes_moved=2 * E * F * bs,
    )
    # 4) edge-space LayerNorm (graph mode: stats over all edges)
    def ln_graph(c):
        mu = c.mean()
        sd = jnp.sqrt(((c - mu) ** 2).mean() + 1e-5)
        return (c - mu) / sd

    scan_time(lambda c: ln_graph(c), eattr, (), iters, "LN graph-mode [E,F]",
              bytes_moved=2 * E * F * bs)

    # 5) edge-space LayerNorm (node mode: per-row stats)
    def ln_node(c):
        mu = c.mean(axis=-1, keepdims=True)
        sd = jnp.sqrt(((c - mu) ** 2).mean(axis=-1, keepdims=True) + 1e-5)
        return (c - mu) / sd

    scan_time(lambda c: ln_node(c), eattr, (), iters, "LN node-mode [E,F]",
              bytes_moved=2 * E * F * bs)

    # 6) Pallas segment sum (sorted)
    from graphcast_lite_tpu.ops.pallas_segment import segment_sum_sorted

    def seg(c, r, base, tile):
        out = segment_sum_sorted(c, r, base, tile, M,
                                 g_proc.seg_tile_receivers, False)
        return c + (out.mean() * 1e-6).astype(c.dtype)

    scan_time(seg, eattr * mask[:, None],
              (g_proc.receivers, g_proc.seg_chunk_base, g_proc.seg_chunk_tile),
              iters, "pallas segment sum", bytes_moved=(E + M) * F * bs)

    # 7) XLA segment sum (sorted)
    def seg_xla(c, r):
        out = jax.ops.segment_sum(c, r, num_segments=M,
                                  indices_are_sorted=True)
        return c + (out.mean() * 1e-6).astype(c.dtype)

    scan_time(seg_xla, eattr * mask[:, None], (g_proc.receivers,),
              iters, "xla segment sum", bytes_moved=(E + M) * F * bs)

    # 8) node matmul [M,F]@[F,F]
    scan_time(lambda c, ww: c @ ww * 0.01, x, (w,), iters,
              "node matmul MxF@FxF", bytes_moved=2 * M * F * bs)


if __name__ == "__main__":
    main()
