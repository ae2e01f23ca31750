"""Dissect the 512x256 train step: per-phase (encoder/processor/decoder)
forward + grad timings, full-step variants (remat on/off, fused on/off).

Usage:
    python scripts/profile_train.py [phases|full|stats] [64x32|512x256]

All timings are tunnel-honest: chained data-dependent args, one scalar
fetch at the end (see bench.py _sync).
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


def build(config_name="512x256"):
    from graphcast_lite_tpu import presets
    from graphcast_lite_tpu.graphs.build import build_graph_set
    from graphcast_lite_tpu.models.weather import ModelGraphs, WeatherModel

    if config_name == "64x32":
        cfg = presets.interaction_net_64x32()
        lat, lon = presets.wb2_64x32_grid()
    else:
        cfg = presets.interaction_net_512x256()
        lat, lon = presets.wb2_512x256_grid()
    gs = build_graph_set(lat, lon, cfg.graph.mesh_levels,
                         cfg.graph.grid2mesh_radius_query)
    graphs = ModelGraphs.from_graph_set(gs)
    model = WeatherModel(pipeline=cfg.pipeline, data=cfg.data,
                         num_grid_nodes=gs.num_grid_nodes,
                         num_mesh_nodes=gs.num_mesh_nodes)
    return cfg, gs, graphs, model


def stats(config_name):
    cfg, gs, graphs, model = build(config_name)
    for name, g in (("enc", graphs.encoding), ("proc", graphs.processing),
                    ("dec", graphs.decoding)):
        ell = None
        if g.has_ell:
            ell = tuple(int(v) for v in g.neigh_senders.shape)
        print(f"{name}: E={g.num_edges} E_pad={g.padded_num_edges} "
              f"N={g.num_nodes} R={g.num_receivers} ELL={ell} "
              f"n_chunks={None if g.seg_chunk_base is None else int(g.seg_chunk_base.shape[0])}")
    print(f"grid={gs.num_grid_nodes} mesh={gs.num_mesh_nodes}")


def _timeit(fn, feed, arg0, iters=4):
    """fn(arg) -> out; feed(arg, out) -> next arg. Returns (compile_s, ms)."""
    t0 = time.time()
    out = fn(arg0)
    _sync(out)
    compile_s = time.time() - t0
    arg = feed(arg0, out)
    t0 = time.time()
    out = fn(arg)
    arg = feed(arg, out)
    _sync(out)
    rewarm_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(arg)
        arg = feed(arg, out)
    _sync(out)
    ms = (time.time() - t0) / iters * 1e3
    return round(compile_s, 1), round(rewarm_s, 1), round(ms, 1)


def phases(config_name):
    import jax
    import jax.numpy as jnp

    from graphcast_lite_tpu.models.weather import ModelBlock, model_output_dim
    from graphcast_lite_tpu.ops.fused_edge import training_trace

    cfg, gs, graphs, model = build(config_name)
    n = gs.num_grid_nodes + gs.num_mesh_nodes
    m = gs.num_mesh_nodes
    obs, f = cfg.data.obs_window_used, cfg.data.num_features_used
    enc_in = obs * f + 6
    h = cfg.pipeline.encoder.mlp.output_dim
    rng = np.random.RandomState(0)
    res = {}

    graphs_bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, graphs)
    specs = {
        "enc": (ModelBlock(cfg.pipeline.encoder, enc_in), (n, enc_in),
                graphs_bf16.encoding),
        "proc": (ModelBlock(cfg.pipeline.processor, h), (m, h),
                 graphs_bf16.processing),
        "dec": (ModelBlock(cfg.pipeline.decoder, h), (n, h),
                graphs_bf16.decoding),
    }
    for name, (mod, shape, graph) in specs.items():
        x32 = jnp.asarray(rng.randn(*shape).astype(np.float32))
        params = jax.jit(mod.init)(jax.random.PRNGKey(0), x32, graph)
        params = jax.tree.map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32 else p, params)
        x = x32.astype(jnp.bfloat16)

        def fwd(arg, mod=mod, graph=graph):
            p, xx = arg
            return mod.apply(p, xx, graph)[0]

        def loss(p, xx, mod=mod, graph=graph):
            out = mod.apply(p, xx, graph)[0]
            return (out.astype(jnp.float32) ** 2).mean()

        def vag(arg, loss=loss):
            p, xx = arg
            l, g = jax.value_and_grad(loss)(p, xx)
            return l, g

        jfwd = jax.jit(fwd)
        jvag = jax.jit(vag)

        def feed_fwd(arg, out):
            p, xx = arg
            bump = out.ravel()[0].astype(xx.dtype) * 1e-12
            return (p, xx + bump)

        def feed_vag(arg, out):
            p, xx = arg
            _, g = out
            p = jax.tree.map(lambda a, b: a + 1e-12 * b.astype(a.dtype), p, g)
            return (p, xx)

        with training_trace():
            c, r, ms = _timeit(jfwd, feed_fwd, (params, x))
        res[f"{name}_fwd"] = {"compile_s": c, "rewarm_s": r, "ms": ms}
        with training_trace():
            c, r, ms = _timeit(jvag, feed_vag, (params, x))
        res[f"{name}_vag"] = {"compile_s": c, "rewarm_s": r, "ms": ms}
        print(name, json.dumps({k: v for k, v in res.items() if k.startswith(name)}))
    print("PHASES", json.dumps(res))


def proconly(config_name):
    """Processor-phase fwd/vag under the current env flags
    (GCLT_PALLAS_SEGMENT / GCLT_FUSED_EDGE / GCLT_SCAN_REMAT)."""
    import jax
    import jax.numpy as jnp

    from graphcast_lite_tpu.models.weather import ModelBlock
    from graphcast_lite_tpu.ops.fused_edge import training_trace

    cfg, gs, graphs, model = build(config_name)
    m = gs.num_mesh_nodes
    h = cfg.pipeline.encoder.mlp.output_dim
    graph = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
        graphs.processing)
    rng = np.random.RandomState(0)
    mod = ModelBlock(cfg.pipeline.processor, h)
    x32 = jnp.asarray(rng.randn(m, h).astype(np.float32))
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x32, graph)
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16)
                          if p.dtype == jnp.float32 else p, params)
    x = x32.astype(jnp.bfloat16)

    def loss(p, xx):
        out = mod.apply(p, xx, graph)[0]
        return (out.astype(jnp.float32) ** 2).mean()

    jfwd = jax.jit(lambda arg: mod.apply(arg[0], arg[1], graph)[0])
    jvag = jax.jit(lambda arg: jax.value_and_grad(loss)(arg[0], arg[1]))

    def feed_fwd(arg, out):
        p, xx = arg
        return (p, xx + out.ravel()[0].astype(xx.dtype) * 1e-12)

    def feed_vag(arg, out):
        p, xx = arg
        _, g = out
        return (jax.tree.map(lambda a, b: a + 1e-12 * b.astype(a.dtype),
                             p, g), xx)

    env = {k: os.environ.get(k) for k in
           ("GCLT_PALLAS_SEGMENT", "GCLT_FUSED_EDGE", "GCLT_SCAN_REMAT")}
    with training_trace():
        c, r, ms = _timeit(jfwd, feed_fwd, (params, x), iters=8)
    print("proc_fwd", json.dumps({"compile_s": c, "ms": ms, "env": env}))
    with training_trace():
        c, r, ms = _timeit(jvag, feed_vag, (params, x), iters=6)
    print("proc_vag", json.dumps({"compile_s": c, "ms": ms, "env": env}))


def full(config_name, remat=True, iters=3, cast_graphs=False):
    import jax
    import jax.numpy as jnp
    import optax

    from graphcast_lite_tpu.training.rollout import RolloutSpec, rollout_loss
    from graphcast_lite_tpu.ops.fused_edge import training_trace

    cfg, gs, graphs, model = build(config_name)
    if cast_graphs:
        graphs = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, graphs)
    n_feat, obs, ar = (cfg.data.num_features_used, cfg.data.obs_window_used,
                       cfg.max_ar_steps)
    g = gs.num_grid_nodes
    spec = RolloutSpec(obs_window=obs, num_features=n_feat,
                       use_residual=True, remat=remat)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(g, obs, n_feat).astype(np.float32))
    y = jnp.asarray(rng.randn(g, ar, n_feat).astype(np.float32))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x.reshape(g, obs * n_feat), graphs)
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    def loss_fn(params, window, targets, graphs):
        params_c = jax.tree.map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
            params)

        def model_fn(inp, m, t, p):
            out, _ = model.apply(params_c, inp, graphs, m, t, p)
            return out, None

        loss, _ = rollout_loss(
            model_fn, window.astype(jnp.bfloat16),
            targets.astype(jnp.bfloat16), ar, spec)
        return loss.astype(jnp.float32)

    res = {}

    # fwd-only loss
    @jax.jit
    def jloss(arg):
        params, x = arg
        return loss_fn(params, x, y, graphs)

    def feed_loss(arg, out):
        params, xx = arg
        return (params, xx + 1e-12 * out)

    c, r, ms = _timeit(jloss, feed_loss, (params, x), iters=iters)
    res["fwd_loss"] = {"compile_s": c, "rewarm_s": r, "ms": ms}
    print("fwd_loss", json.dumps(res["fwd_loss"]))

    # value_and_grad only
    @jax.jit
    def jvag(arg):
        params, x = arg
        return jax.value_and_grad(loss_fn)(params, x, y, graphs)

    def feed_vag(arg, out):
        params, xx = arg
        _, grads = out
        params = jax.tree.map(lambda a, b: a + 1e-12 * b.astype(a.dtype),
                              params, grads)
        return (params, xx)

    c, r, ms = _timeit(jvag, feed_vag, (params, x), iters=iters)
    res["vag"] = {"compile_s": c, "rewarm_s": r, "ms": ms}
    print("vag", json.dumps(res["vag"]))

    # full step
    @jax.jit
    def jstep(arg):
        params, opt_state = arg
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y, graphs)
        grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def feed_step(arg, out):
        return (out[0], out[1])

    c, r, ms = _timeit(jstep, feed_step, (params, opt_state), iters=iters)
    res["step"] = {"compile_s": c, "rewarm_s": r, "ms": ms}
    print("step", json.dumps(res["step"]))
    print("FULL", json.dumps({"remat": remat, **res}))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "stats"
    cfgname = sys.argv[2] if len(sys.argv) > 2 else "512x256"
    if mode == "stats":
        stats(cfgname)
    elif mode == "phases":
        phases(cfgname)
    elif mode == "proconly":
        proconly(cfgname)
    elif mode == "full":
        full(cfgname)
    elif mode == "full_noremat":
        full(cfgname, remat=False)
    elif mode == "full_bf16graphs":
        full(cfgname, cast_graphs=True)
    elif mode == "full_bf16graphs_noremat":
        full(cfgname, remat=False, cast_graphs=True)
