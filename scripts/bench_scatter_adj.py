"""Microbench: alternatives for the sender-gather adjoint (scatter-add of
edge cotangents into node rows) at the 512x256 processor workload.

  a) XLA scatter-add, unsorted indices (what jnp.take's VJP emits)
  b) XLA segment_sum after a host-precomputed sort permutation (sorted)
  c) random permutation gather + Pallas sorted-segment kernel

Usage: python scripts/bench_scatter_adj.py [E] [N] [F] [dtype]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from graphcast_lite_tpu.ops.pallas_segment import (
    build_schedule,
    segment_sum_sorted,
)


def main():
    e = int(sys.argv[1]) if len(sys.argv) > 1 else 287_744
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 40_962
    f = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    dtype = jnp.bfloat16 if (len(sys.argv) > 4 and sys.argv[4] == "bf16") else jnp.float32

    rng = np.random.RandomState(0)
    senders = rng.randint(0, n, size=e).astype(np.int32)
    perm = np.argsort(senders, kind="stable").astype(np.int32)
    s_sorted = senders[perm]
    base, tile = build_schedule(s_sorted, n)

    g_np = rng.randn(e, f).astype(np.float32)
    g = jnp.asarray(g_np, dtype=dtype)
    snd = jnp.asarray(senders)
    prm = jnp.asarray(perm)
    ss = jnp.asarray(s_sorted)
    base_d, tile_d = jnp.asarray(base), jnp.asarray(tile)

    def a_scatter(m):
        return jnp.zeros((n, f), m.dtype).at[snd].add(m)

    def b_sorted_xla(m):
        return jax.ops.segment_sum(
            jnp.take(m, prm, axis=0), ss, num_segments=n,
            indices_are_sorted=True,
        )

    def c_pallas(m):
        return segment_sum_sorted(jnp.take(m, prm, axis=0), ss,
                                  base_d, tile_d, n)

    def d_take_only(m):
        return jnp.take(m, prm, axis=0)[:n]

    ref = np.zeros((n, f), np.float32)
    np.add.at(ref, senders, g_np)

    iters = 30
    for name, once in [("xla_scatter", a_scatter), ("xla_sorted", b_sorted_xla),
                       ("pallas", c_pallas), ("take_only", d_take_only)]:
        @jax.jit
        def fn(m, once=once):
            def body(_, m):
                out = once(m)
                return jax.lax.dynamic_update_slice(
                    m, out[: min(n, e)].astype(m.dtype), (0, 0)
                )
            return jax.lax.fori_loop(0, iters, body, m)

        out1 = jax.jit(once)(g)
        out1.block_until_ready()
        err = (float(np.abs(np.asarray(out1[:n], np.float32) - ref).max())
               if name != "take_only" else float("nan"))
        o = fn(g); o.block_until_ready()
        t0 = time.time(); o = fn(g); o.block_until_ready()
        dt = (time.time() - t0) / iters
        print(f"{name:12s} {dt*1e3:8.3f} ms   max|err|={err:.3e}")


if __name__ == "__main__":
    main()
