"""Microbench: Pallas sorted-segment-sum kernel vs XLA segment_sum on TPU.

Shapes model the 512x256 flagship processor workload (multimesh [4,6]:
~287K directed edges into 40,962 mesh nodes, feature dim 256).

Usage: python scripts/bench_segment.py [E] [R] [F] [dtype]
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
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 40_962
    f = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    dtype = jnp.bfloat16 if (len(sys.argv) > 4 and sys.argv[4] == "bf16") else jnp.float32

    rng = np.random.RandomState(0)
    recv = np.sort(rng.randint(0, r, size=e)).astype(np.int32)
    msgs = rng.randn(e, f).astype(np.float32)
    base, tile = build_schedule(recv, r)
    print(f"E={e} R={r} F={f} nchunks={len(base)} "
          f"dtype={np.dtype(jnp.dtype(dtype)).name}")

    msgs_d = jnp.asarray(msgs, dtype=dtype)
    recv_d = jnp.asarray(recv)
    base_d, tile_d = jnp.asarray(base), jnp.asarray(tile)

    iters = 50

    def kernel_once(m):
        return segment_sum_sorted(m, recv_d, base_d, tile_d, r)

    def xla_once(m):
        return jax.ops.segment_sum(
            m, recv_d, num_segments=r, indices_are_sorted=True
        )

    def looped(once):
        # iters dependent applications inside ONE dispatch (the output is
        # scattered back over the edge rows via tiling) so tunnel RTT and
        # per-call overhead are amortized out of the measurement.
        @jax.jit
        def fn(m):
            def body(_, m):
                out = once(m)
                return jax.lax.dynamic_update_slice(
                    m, out[: min(r, e)].astype(m.dtype), (0, 0)
                )
            return jax.lax.fori_loop(0, iters, body, m)
        return fn

    ref = np.zeros((r, f), np.float32)
    np.add.at(ref, recv, msgs)

    for name, once in [("pallas", kernel_once), ("xla", xla_once)]:
        out = jax.jit(once)(msgs_d)
        out.block_until_ready()
        err = float(np.abs(np.asarray(out, np.float32) - ref).max())
        fn = looped(once)
        o = fn(msgs_d)
        o.block_until_ready()
        t0 = time.time()
        o = fn(msgs_d)
        o.block_until_ready()
        dt = (time.time() - t0) / iters
        gb = e * f * jnp.dtype(dtype).itemsize / 1e9
        print(f"{name:7s} {dt*1e3:8.3f} ms   {gb/dt:7.1f} GB/s edge-stream"
              f"   max|err|={err:.3e}")


if __name__ == "__main__":
    main()
