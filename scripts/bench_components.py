"""Component-level timing of the flagship 512x256 forward on the real TPU.

Times the full single-step forward plus its three stages in isolation
(encoder / processor / decoder as separate jitted programs over the same
graph bundle) so the optimization budget goes where the milliseconds are.

Each measurement is ONE dispatch of a lax.scan whose carry depends on the
previous iteration's output: on the remote-tunnel backend, independent
repeated dispatches of identical programs are coalesced/cached, so naive
timing loops measure nothing.

Usage: python scripts/bench_components.py [bf16|f32] [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def scan_time(body, init, args, iters, label):
    """Time one dispatch of `iters` chained body() applications.

    ``graphs`` rides as a jit ARGUMENT: closure-captured device arrays make
    lowering fetch them back through the TPU tunnel (minutes vs sub-second).
    """

    def fn_(c, *extra):
        def step(carry, _):
            return body(carry, *extra), None

        return jax.lax.scan(step, c, None, length=iters)[0]

    fn = jax.jit(fn_)
    t0 = time.time()
    out = fn(init, *args)
    _ = np.asarray(jnp.ravel(out)[0])   # force full materialization
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    out = fn(out, *args)
    _ = np.asarray(jnp.ravel(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"[{label:<9}] {dt*1e3:8.2f} ms   (compile+1st {compile_s:.1f}s)")
    return dt


def main():
    dtype = jnp.bfloat16 if (len(sys.argv) < 2 or sys.argv[1] == "bf16") else jnp.float32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from graphcast_lite_tpu import presets
    from graphcast_lite_tpu.graphs.build import build_graph_set
    from graphcast_lite_tpu.models.weather import (
        ModelBlock, ModelGraphs, WeatherModel, model_output_dim,
    )

    cfg = presets.interaction_net_512x256()
    lat, lon = presets.wb2_512x256_grid()
    n_feat = cfg.data.num_features_used
    obs = cfg.data.obs_window_used

    t0 = time.time()
    gs = build_graph_set(lat, lon, cfg.graph.mesh_levels,
                         cfg.graph.grid2mesh_radius_query)
    graphs = ModelGraphs.from_graph_set(gs)
    print(f"[build] {time.time()-t0:.1f}s  enc_e={gs.encoding.num_edges} "
          f"proc_e={gs.processing.num_edges} dec_e={gs.decoding.num_edges}")

    model = WeatherModel(
        pipeline=cfg.pipeline, data=cfg.data,
        num_grid_nodes=gs.num_grid_nodes, num_mesh_nodes=gs.num_mesh_nodes,
    )
    g = gs.num_grid_nodes
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(g, obs * n_feat).astype(np.float32))

    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, graphs)
    if dtype == jnp.bfloat16:
        params = jax.tree.map(
            lambda t: t.astype(jnp.bfloat16) if t.dtype == jnp.float32 else t,
            params)
        x = x.astype(dtype)
        graphs = jax.tree.map(
            lambda t: t.astype(jnp.bfloat16)
            if hasattr(t, "dtype") and t.dtype == jnp.float32 else t,
            graphs,
        )

    in_dim = obs * n_feat
    enc_in_dim = model._encoder_input_dim()
    hid = model_output_dim(cfg.pipeline.encoder, enc_in_dim)
    n_steps = cfg.pipeline.processor.gcn.num_message_passing_steps or 4

    def full_body(xx, gg, pp):
        out, _ = model.apply(pp, xx, gg)
        # fold the prediction back into the window: real AR dependency
        return jnp.concatenate([xx[:, n_feat:], out.astype(xx.dtype)], axis=1)

    scan_time(full_body, x, (graphs, params), iters, "full fwd")

    # Stage blocks applied standalone with their param subtrees.
    enc_block = ModelBlock(cfg.pipeline.encoder, enc_in_dim)
    proc_block = ModelBlock(cfg.pipeline.processor, hid)
    dec_in = model_output_dim(cfg.pipeline.processor, hid)
    dec_block = ModelBlock(cfg.pipeline.decoder, dec_in)
    p_enc = {"params": params["params"]["encoder"]}
    p_proc = {"params": params["params"]["processor"]}
    p_dec = {"params": params["params"]["decoder"]}

    def enc_body(xx, gg, pp):
        grid_in = jnp.concatenate([xx, gg.grid_static], axis=-1)
        mesh_dyn = jnp.zeros((gs.num_mesh_nodes, xx.shape[-1]), xx.dtype)
        mesh_in = jnp.concatenate([mesh_dyn, gg.mesh_static], axis=-1)
        z = jnp.concatenate([grid_in, mesh_in], axis=0)
        z, _ = enc_block.apply(pp, z, gg.encoding)
        return xx + (1e-6 * z[: xx.shape[0], : xx.shape[1]]).astype(xx.dtype)

    def proc_body(m, gg, pp):
        out, _ = proc_block.apply(pp, m, gg.processing, None, 0.0, False)
        return (0.5 * out).astype(m.dtype)

    def dec_body(c, gg, pp):
        out, _ = dec_block.apply(pp, c, gg.decoding)
        return c + (1e-6 * out.mean()).astype(c.dtype)

    mesh_lat = jnp.asarray(rng.randn(gs.num_mesh_nodes, hid)).astype(dtype)
    combined = jnp.asarray(
        rng.randn(g + gs.num_mesh_nodes, hid)).astype(dtype)

    e = scan_time(enc_body, x, (graphs, p_enc), iters, "encoder")
    pt = scan_time(proc_body, mesh_lat, (graphs, p_proc), iters, "processor")
    print(f"            ({pt*1e3/n_steps:.2f} ms/step x {n_steps})")
    d = scan_time(dec_body, combined, (graphs, p_dec), iters, "decoder")
    print(f"[sum      ] {(e+pt+d)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
