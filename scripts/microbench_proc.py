"""Processor-only A/B at flagship scale: 12-step InteractionNet forward
(inference trace) and value_and_grad (training trace) under the
GCLT_LAZY_EDGE x GCLT_MEGA_EDGE matrix.  One program per cell; timings
tunnel-honest (chained args, one fetch).

Usage: python scripts/microbench_proc.py [fwd|vag] [cells like 00 01 10 11]
       (first digit: lazy, second: mega)
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


def main():
    import jax
    import jax.numpy as jnp

    from graphcast_lite_tpu import presets
    from graphcast_lite_tpu.graphs.build import build_graph_set
    from graphcast_lite_tpu.models.gnn import InteractionNetProcessor
    from graphcast_lite_tpu.ops.fused_edge import training_trace

    mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    cells = sys.argv[2:] or ["00", "01", "10", "11"]

    lat, lon = presets.wb2_512x256_grid()
    gs = build_graph_set(lat, lon, [4, 6], 0.6)
    graph = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
        gs.processing,
    )
    m, h = graph.num_nodes, 256
    rng = np.random.RandomState(0)
    proc = InteractionNetProcessor(
        node_dim=h, raw_edge_dim=4, edge_latent_dim=h, hidden_dim=h,
        num_steps=12, activation="swish", use_layer_norm=True,
    )
    x32 = jnp.asarray(rng.randn(m, h).astype(np.float32))
    os.environ["GCLT_LAZY_EDGE"] = "0"
    params = jax.jit(proc.init)(jax.random.PRNGKey(0), x32, graph)
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params,
    )
    x = x32.astype(jnp.bfloat16)
    res = {}

    for cell in cells:
        os.environ["GCLT_LAZY_EDGE"] = cell[0]
        os.environ["GCLT_MEGA_EDGE"] = cell[1]

        if mode == "fwd":
            def fn(arg):
                p, xx = arg
                return proc.apply(p, xx, graph)
        else:
            def loss(p, xx):
                out = proc.apply(p, xx, graph)
                return (out.astype(jnp.float32) ** 2).mean()

            def fn(arg):
                with training_trace():
                    return jax.value_and_grad(loss)(*arg)

        if mode == "vag":
            with training_trace():
                jf = jax.jit(fn)
                out = jf((params, x))
                _sync(out)
        else:
            jf = jax.jit(fn)
            t0 = time.time()
            out = jf((params, x))
            _sync(out)
        t0 = time.time()
        out = jf((params, x))
        _sync(out)
        # chained timing
        if mode == "fwd":
            arg = (params, x + out.ravel()[0] * 1e-12)
        else:
            _, g = out
            arg = (jax.tree.map(
                lambda a, b: a + 1e-12 * b.astype(a.dtype), params, g), x)
        out = jf(arg)
        _sync(out)
        iters = 8 if mode == "fwd" else 5
        t0 = time.time()
        for _ in range(iters):
            out = jf(arg)
            if mode == "fwd":
                arg = (arg[0], arg[1] + out.ravel()[0] * 1e-12)
            else:
                _, g = out
                arg = (jax.tree.map(
                    lambda a, b: a + 1e-12 * b.astype(a.dtype),
                    arg[0], g), arg[1])
        _sync(out)
        ms = (time.time() - t0) / iters * 1e3
        res[f"{mode}_{cell}"] = round(ms, 2)
        print(f"{mode} lazy={cell[0]} mega={cell[1]}: {ms:.2f} ms")

    os.environ.pop("GCLT_LAZY_EDGE", None)
    os.environ.pop("GCLT_MEGA_EDGE", None)
    print("JSON", json.dumps(res))


if __name__ == "__main__":
    main()
