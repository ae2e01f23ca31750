"""Microbenchmark of one InteractionNet processor step's pieces on the
real TPU at flagship scale (512x256 / mesh [4,6]).

Methodology notes (axon tunnel) — see also ROADMAP "what round 5 learned":
* block_until_ready is a NO-OP over the tunnel; sync() fetches a value;
* every timed call feeds a DISTINCT input (cycled variants) — identical
  repeated (program, args) pairs can be deduplicated server-side and
  time as pure dispatch overhead;
* only the LARGE (multi-ms, chained) numbers here are decision-grade;
  isolated sub-millisecond op timings are unreliable regardless.

Run: python scripts/microbench_step.py [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def sync(x):
    """Force remote completion: over the axon tunnel block_until_ready is
    a NO-OP — only a host VALUE FETCH actually waits (bench.py _sync)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.float32(leaf.ravel()[0]))


def timeit(fn, variants, iters=12, warmup=2):
    """variants: list of arg-tuples cycled per call (defeats result caching).
    NOTE: per-call numbers remain upper-bounded approximations — for
    sub-millisecond ops prefer data-dependent chains (see the ablation
    harness in ROADMAP "what round 5 learned")."""
    for i in range(warmup):
        sync(fn(*variants[i % len(variants)]))
    t0 = time.time()
    out = None
    for i in range(iters):
        out = fn(*variants[i % len(variants)])
    sync(out)
    return (time.time() - t0) / iters * 1e3


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    from graphcast_lite_tpu import presets
    from graphcast_lite_tpu.graphs.build import build_graph_set

    lat, lon = presets.wb2_512x256_grid()
    gs = build_graph_set(lat, lon, [4, 6], 0.6)
    pg = gs.processing
    m = gs.num_mesh_nodes
    e_pad = pg.senders.shape[0]
    h = 256
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)

    def mk(shape, k=12, scale=1.0):
        # one UNIQUE input per timed iteration: repeated (program, args)
        # pairs can be deduplicated by the remote dispatch layer
        return [jnp.asarray(rng.randn(*shape) * scale, dt) for _ in range(k)]

    xs = mk((m, h))
    vs = mk((e_pad, h))
    w = jnp.asarray(rng.randn(h, h) * 0.05, dt)
    senders = jnp.asarray(pg.senders)
    mask = jnp.asarray(pg.edge_mask, dt)

    print(f"[micro] E_pad={e_pad} M={m} H={h} dtype=bf16 iters={iters}")

    # Calibration: square matmul at known roofline.
    big = mk((4096, 4096), 12)
    wb = jnp.asarray(rng.randn(4096, 4096) * 0.01, dt)
    f = jax.jit(lambda a, w: a @ w)
    ms = timeit(f, [(b, wb) for b in big], iters=iters)
    tflops = 2 * 4096**3 / (ms * 1e-3) / 1e12
    print(f"  4096^3 matmul:                 {ms:7.3f} ms ({tflops:.0f} TF/s)")

    # Edge matmul [E,H]@[H,H].
    f = jax.jit(lambda v, w: v @ w)
    ms = timeit(f, [(v, w) for v in vs], iters=iters)
    gf = 2 * e_pad * h * h / 1e9
    print(f"  v@W [E,256]@[256,256]:         {ms:7.3f} ms "
          f"({gf / (ms * 1e-3) / 1e3:.0f} TF/s, {gf:.1f} GF)")

    # Sender gather [E, H] full.
    f = jax.jit(lambda x, s: jnp.take(x, s, axis=0))
    ms = timeit(f, [(x, senders) for x in xs], iters=iters)
    gb = e_pad * h * 2 / 1e9
    print(f"  gather senders [E,H]:          {ms:7.3f} ms "
          f"({gb / (ms * 1e-3):.0f} GB/s out)")

    # act tail.
    f = jax.jit(lambda v, w: jax.nn.silu(v.astype(jnp.float32)).astype(dt) @ w)
    ms = timeit(f, [(v, w) for v in vs], iters=iters)
    print(f"  act(v)@W tail:                 {ms:7.3f} ms")

    # Segment-sum kernel.
    from graphcast_lite_tpu.ops import segment as seg_ops

    f = jax.jit(lambda u: seg_ops.aggregate_sum(u, pg, mask))
    ms = timeit(f, [(v,) for v in vs], iters=iters)
    print(f"  segment-sum kernel:            {ms:7.3f} ms")

    # Composed edge side.
    def composed(x, v):
        hh = (jnp.take(x @ w, senders, axis=0)
              + jnp.take(x @ w, pg.receivers, axis=0)
              + v @ w)
        u = jax.nn.silu(hh.astype(jnp.float32)).astype(dt) @ w
        agg = seg_ops.aggregate_sum(u, pg, mask)
        return u, agg

    f = jax.jit(composed)
    ms = timeit(f, list(zip(xs, vs)), iters=iters)
    print(f"  composed edge side:            {ms:7.3f} ms")

    # Full 12-step processor, bf16 params + bf16 graph (inference-like:
    # the trainers/bench cast graph leaves too, else f32 masks/attrs
    # promote the whole scan carry).
    from graphcast_lite_tpu.models.gnn import InteractionNetProcessor

    pgb = jax.tree.map(
        lambda a: a.astype(dt)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, pg)

    proc12 = InteractionNetProcessor(
        node_dim=h, raw_edge_dim=4, edge_latent_dim=h, hidden_dim=h,
        num_steps=12, activation="swish", use_layer_norm=True)
    p12 = jax.jit(proc12.init)(
        jax.random.PRNGKey(0), xs[0].astype(jnp.float32), pg)

    p12b = jax.tree.map(
        lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, p12)
    f = jax.jit(lambda p, x: proc12.apply(p, x, pgb))
    ms = timeit(f, [(p12b, x) for x in xs], iters=max(iters // 2, 4))
    print(f"  full 12-step processor bf16:   {ms:7.3f} ms "
          f"({ms / 12:.3f} ms/step)")

    if getattr(pg, "step_sched", None) is not None:
        os.environ["GCLT_EDGE_STEP"] = "1"
        f = jax.jit(lambda p, x: proc12.apply(p, x, pgb))
        ms = timeit(f, [(p12b, x) for x in xs], iters=max(iters // 2, 4))
        print(f"  12-step with edge-step kernel: {ms:7.3f} ms "
              f"({ms / 12:.3f} ms/step)")
        del os.environ["GCLT_EDGE_STEP"]


if __name__ == "__main__":
    main()
