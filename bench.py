"""Benchmark: AR-rollout throughput (grid-points/s/chip) on the flagship
encode-process-decode model.

Measures the BASELINE.json north-star metric on two configs:
  * WB2 64x32 / 33 features, mesh [3,5]  (the reference's benchmark grid)
  * WB2 512x256 / 19 features, mesh [4,6] (wb2_512x256_19f_ar, headline)
each as a single jitted 4-step AR rollout (hidden 256, 12 InteractionNet
message-passing steps — the reference's "freeze6"-class model, ~5.9M params).

Baseline derivation (the reference publishes no throughput numbers): its DA
experiment log records ~6.5 min per 200-sample AR-4 inference experiment on
the 512x256 grid on an A100-80GB (DA_EXPERIMENTS_GLOBAL_RESULTS.md:156),
i.e. 200 × 4 × 131072 / 390 s ≈ 2.69e5 grid-points/s — an upper bound on the
reference's effective rollout throughput (includes its DA overhead).
``vs_baseline`` is ours ÷ that estimate.

Prints ONE JSON line:
  {"metric": "grid_points_per_s_per_chip_512x256_ar4", "value": ...,
   "unit": "grid-points/s", "vs_baseline": ..., "extra": {...}}
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

REFERENCE_THROUGHPUT_512 = 2.69e5  # grid-points/s, derived above

# Hardware ceilings for efficiency reporting (v5e defaults; override for a
# different chip with GCLT_PEAK_TFLOPS / GCLT_HBM_GBPS).
PEAK_TFLOPS = float(os.environ.get("GCLT_PEAK_TFLOPS", 197.0))   # bf16
HBM_GBPS = float(os.environ.get("GCLT_HBM_GBPS", 819.0))


def _sync(x):
    """Force remote completion and return wall time of the fetch.

    Over the axon tunnel ``block_until_ready`` is a NO-OP (measured: a
    100-matmul chain 'completes' in 0.3 ms); only a host fetch actually
    waits.  Also: the tunnel appears to cache executions with identical
    args (the same matmul chain timed 2x faster when re-run on the same
    inputs), so every timed call in this file feeds the previous output
    forward — distinct, data-dependent args.
    """
    import jax
    import jax.numpy as jnp

    leaf = jax.tree.leaves(x)[0]
    return float(jnp.float32(leaf.ravel()[0]))


def analytic_cost(gs, cfg, dtype_bytes=2):
    """(matmul FLOPs, minimum HBM bytes) for ONE forward model call.

    FLOPs: every dense matmul of the flagship pipeline (MLPs, GCN xW,
    InteractionNet edge/node MLPs; the aggregations are gather/adds and
    contribute O(E·h) — included).  Bytes: a LOWER bound — each major edge/
    node tensor read+written once per use with perfect fusion; real programs
    move more, so roofline_pct ≤ 100 means "this much of the bandwidth-bound
    minimum is achieved".
    """
    g, m = gs.num_grid_nodes, gs.num_mesh_nodes
    e = gs.processing.padded_num_edges
    # A cost-model failure must not discard completed timings: fall back to
    # the GCN block's output_dim when there is no encoder MLP.
    enc = cfg.pipeline.encoder
    h = enc.mlp.output_dim if enc.mlp is not None else int(enc.gcn.output_dim)
    f = cfg.data.num_features_used
    obs = cfg.data.obs_window_used
    mp = cfg.pipeline.processor.gcn.num_message_passing_steps or 12
    enc_in = obs * f + 6
    n = g + m

    flops = 0.0
    # encoder MLP (enc_in -> 2h -> h) on grid+mesh rows, then 2 GCN convs
    flops += 2 * n * (enc_in * 2 * h + 2 * h * h)
    flops += 2 * 2 * n * h * h
    # processor: raw-edge encoder + mp interaction steps
    flops += 2 * e * 4 * h
    per_step = (
        2 * (2 * m * h * h)        # edge MLP lin0 node projections
        + 2 * e * h * h            # edge MLP lin0 edge-latent projection
        + 2 * e * h * h            # edge MLP lin1
        + 2 * m * (2 * h * h)      # node MLP lin0 ([x ‖ agg])
        + 2 * m * h * h            # node MLP lin1
        + 2 * e * h                # aggregation adds
    )
    flops += mp * per_step
    # decoder MLP (h -> 2h -> h) + conv(h->h) + conv(h->f)
    flops += 2 * n * (h * 2 * h + 2 * h * h)
    flops += 2 * n * h * h + 2 * n * h * f

    # minimum bytes: processor dominates — per step read+write the edge
    # latents twice (MLP in/out, residual+LN) and the node latents, plus the
    # sender-gather materialization; encoder/decoder each stream the node
    # tensors a handful of times.
    b = dtype_bytes
    bytes_min = mp * (4 * e * h + 4 * m * h) * b
    bytes_min += (6 * n * h + 2 * n * enc_in) * b   # encoder streams
    bytes_min += 6 * n * h * b                      # decoder streams
    return flops, bytes_min


def build(config_name: str, dtype):
    import jax
    import jax.numpy as jnp

    from graphcast_lite_tpu import presets
    from graphcast_lite_tpu.graphs.build import build_graph_set
    from graphcast_lite_tpu.models.weather import ModelGraphs, WeatherModel
    from graphcast_lite_tpu.training.rollout import RolloutSpec, rollout_predict

    if config_name == "64x32":
        cfg = presets.interaction_net_64x32()
        lat, lon = presets.wb2_64x32_grid()
    else:
        cfg = presets.interaction_net_512x256()
        lat, lon = presets.wb2_512x256_grid()
    n_feat = cfg.data.num_features_used
    obs = cfg.data.obs_window_used
    ar = cfg.max_ar_steps

    gs = build_graph_set(lat, lon, cfg.graph.mesh_levels,
                         cfg.graph.grid2mesh_radius_query)
    graphs = ModelGraphs.from_graph_set(gs)
    model = WeatherModel(
        pipeline=cfg.pipeline, data=cfg.data,
        num_grid_nodes=gs.num_grid_nodes, num_mesh_nodes=gs.num_mesh_nodes,
    )
    spec = RolloutSpec(obs_window=obs, num_features=n_feat,
                       use_residual=True, remat=False)

    g = gs.num_grid_nodes
    x = jnp.asarray(
        np.random.RandomState(0).randn(g, obs, n_feat).astype(np.float32),
        dtype=dtype,
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x.reshape(g, obs * n_feat).astype(jnp.float32),
        graphs,
    )
    if dtype == jnp.bfloat16:
        params = jax.tree.map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32 else p, params
        )
        graphs = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, graphs
        )

    def rollout(params, window, graphs):
        # graphs ride as jit ARGUMENTS: closure-captured device constants
        # make lowering fetch them through the TPU tunnel (~3 min); as args
        # the whole trace+lower is sub-second.
        def model_fn(inp, m, t, p):
            out, _ = model.apply(params, inp, graphs, m, t, p)
            return out, None

        return rollout_predict(model_fn, window, ar, spec)

    import jax as _jax
    fn = _jax.jit(rollout)
    return fn, params, x, graphs, g, ar, gs, cfg, spec, model


def bench_config(config_name: str, iters: int, dtype_name: str):
    """AR-rollout timing, honest over the axon tunnel.

    All `iters` executions are dispatched back-to-back with a data
    dependency (the last prediction feeds the next window — distinct args,
    see _sync) and completion is forced by ONE scalar fetch at the end, so
    the per-rollout time is (true device execution) + RTT/iters.  The
    RTT-inclusive single-dispatch serve latency is reported separately
    (dispatch_ms)."""
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    t0 = time.time()
    (fn, params, x, graphs, g, ar, gs, cfg, spec,
     model) = build(config_name, dtype)
    build_s = time.time() - t0

    # First call + fetch = trace + XLA compile (the remote server compiles
    # lazily at first execution; earlier "compile" timings that used
    # block_until_ready under-reported this).
    t0 = time.time()
    out = fn(params, x, graphs)
    _sync(out)
    compile_s = time.time() - t0

    def next_window(window, out):
        return jnp.concatenate(
            [window[:, 1:, :], out[:, -1:, :].astype(window.dtype)], axis=1
        )

    # Warm up the CHAINED input signature before timing: the device-produced
    # window (slice+concat of the previous output) can carry a different
    # layout than the host-fresh x, and the first such call recompiles the
    # whole program (~60 s at 512x256, measured) — that must not land inside
    # the timed loop.
    window = next_window(x, out)
    t0 = time.time()
    out = fn(params, window, graphs)
    window = next_window(window, out)
    _sync(window)
    rewarm_s = time.time() - t0

    t0 = time.time()
    for _ in range(iters):
        out = fn(params, window, graphs)
        window = next_window(window, out)
    _sync(window)
    dt = (time.time() - t0) / iters
    points_per_s = g * ar / dt

    # Compile-budget check: the remote axon server keeps a compile cache, so
    # a previously-seen program compiles in seconds; a NEVER-seen one can
    # take minutes (measured 815 s cold vs 73 s warm for the identical 64x32
    # program).  Flag cold-cache compiles so they aren't read as a steady-
    # state regression.
    if compile_s > 120:
        print(f"# WARN {config_name}: compile_s={compile_s:.0f}s exceeds "
              "the 120s budget — likely a cold remote-compile-cache (first "
              "build of this program); a re-run compiles from cache",
              file=sys.stderr)

    # RTT-inclusive serve latency of one dispatch (executable warm).
    t0 = time.time()
    out = fn(params, window, graphs)
    _sync(out)
    dispatch_ms = (time.time() - t0) * 1e3

    flops, bytes_min = analytic_cost(
        gs, cfg, dtype_bytes=2 if dtype_name == "bf16" else 4
    )
    return {
        "grid_points_per_s": points_per_s,
        "rollout_ms": dt * 1e3,
        "dispatch_ms": round(dispatch_ms, 1),
        "grid_nodes": g,
        "ar_steps": ar,
        "build_s": round(build_s, 1),
        "compile_s": round(compile_s, 1),
        "rewarm_s": round(rewarm_s, 1),
        "dtype": dtype_name,
        "iters": iters,
        "mfu_pct": round(100 * ar * flops / dt / (PEAK_TFLOPS * 1e12), 2),
        "hbm_roofline_pct": round(
            100 * ar * bytes_min / dt / (HBM_GBPS * 1e9), 1
        ),
        "flops_per_call": flops,
        "min_bytes_per_call": bytes_min,
    }


def bench_training(config_name: str, iters: int = 3, mixed: bool = True):
    """Full train-step (AR-4 BPTT + Adam) throughput.

    mixed=True: bf16 activations/compute with fp32 master params and fp32
    grad application (standard mixed precision — halves the rollout's
    activation memory, which is what bounds AR-4 BPTT at 512x256)."""
    import jax
    import jax.numpy as jnp
    import optax

    from graphcast_lite_tpu import presets
    from graphcast_lite_tpu.graphs.build import build_graph_set
    from graphcast_lite_tpu.models.weather import ModelGraphs, WeatherModel
    from graphcast_lite_tpu.training.rollout import RolloutSpec, rollout_loss

    if config_name == "64x32":
        cfg = presets.interaction_net_64x32()
        lat, lon = presets.wb2_64x32_grid()
    else:
        cfg = presets.interaction_net_512x256()
        lat, lon = presets.wb2_512x256_grid()
    n_feat, obs, ar = (cfg.data.num_features_used, cfg.data.obs_window_used,
                       cfg.max_ar_steps)
    gs = build_graph_set(lat, lon, cfg.graph.mesh_levels,
                         cfg.graph.grid2mesh_radius_query)
    graphs = ModelGraphs.from_graph_set(gs)
    model = WeatherModel(pipeline=cfg.pipeline, data=cfg.data,
                         num_grid_nodes=gs.num_grid_nodes,
                         num_mesh_nodes=gs.num_mesh_nodes)
    g = gs.num_grid_nodes
    spec = RolloutSpec(obs_window=obs, num_features=n_feat,
                       use_residual=True, remat=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(g, obs, n_feat).astype(np.float32))
    y = jnp.asarray(rng.randn(g, ar, n_feat).astype(np.float32))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x.reshape(g, obs * n_feat), graphs
    )
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    cdtype = jnp.bfloat16 if mixed else jnp.float32
    if mixed:
        # graphs must be cast too: f32 grid_static/edge_attr otherwise
        # promote the whole forward back to fp32 (measured 2709 -> 1959 ms)
        graphs = jax.tree.map(
            lambda a: a.astype(cdtype)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, graphs
        )

    def loss_fn(params, window, targets, graphs):
        params_c = jax.tree.map(
            lambda p: p.astype(cdtype) if p.dtype == jnp.float32 else p,
            params,
        )

        def model_fn(inp, m, t, p):
            out, _ = model.apply(params_c, inp, graphs, m, t, p)
            return out, None

        loss, _ = rollout_loss(
            model_fn, window.astype(cdtype), targets.astype(cdtype), ar, spec
        )
        return loss.astype(jnp.float32)

    # donate (params, opt_state) exactly like the Trainer does — without it
    # the step keeps two copies of the optimizer state live (~140 MB, enough
    # to OOM the 15.7G budget at 512x256 with scan_remat=none)
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, x, y, graphs):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y, graphs)
        grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # Per-phase breakdown: forward-only loss timed separately; bwd+opt is
    # the remainder (the optimizer itself is ~free: 5.9M-param Adam).
    @jax.jit
    def jloss(params, x, y, graphs):
        return loss_fn(params, x, y, graphs)

    l0 = jloss(params, x, y, graphs)
    _sync(l0)
    # rewarm the device-produced-input signature before timing (layout
    # recompile otherwise lands in the loop — see bench_config)
    lx = x + 1e-12 * _last_loss_bump(l0, x)
    l0 = jloss(params, lx, y, graphs)
    _sync(l0)
    t0 = time.time()
    for _ in range(iters):
        lx = lx + 1e-12 * _last_loss_bump(jloss(params, lx, y, graphs), lx)
    _sync(lx)
    fwd_ms = (time.time() - t0) / iters * 1e3

    t0 = time.time()
    params, opt_state, loss = step(params, opt_state, x, y, graphs)
    _sync(loss)
    compile_s = time.time() - t0
    # Second call warms the DEVICE-PRODUCED (params, opt_state) input
    # signature — its layout can differ from the host-fresh one and the
    # first such call recompiles (see bench_config).
    t0 = time.time()
    params, opt_state, loss = step(params, opt_state, x, y, graphs)
    _sync(loss)
    rewarm_s = time.time() - t0
    # Data-dependent across iterations through (params, opt_state); one
    # fetch at the end (block_until_ready is a no-op over the tunnel).
    t0 = time.time()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, x, y, graphs)
    _sync(loss)
    dt = (time.time() - t0) / iters
    # fwd + backward (≈2× fwd) + remat recompute (≈1× fwd) per AR step
    flops_fwd, _ = analytic_cost(gs, cfg, dtype_bytes=2 if mixed else 4)
    train_flops = 4.0 * ar * flops_fwd
    return {
        "train_step_ms": dt * 1e3,
        "train_grid_points_per_s": g * ar / dt,
        "fwd_ms": round(fwd_ms, 1),
        "bwd_opt_ms": round(dt * 1e3 - fwd_ms, 1),
        "compile_s": round(compile_s, 1),
        "rewarm_s": round(rewarm_s, 1),
        "loss": float(loss),
        "grid_nodes": g,
        "ar_steps": ar,
        "mfu_pct": round(100 * train_flops / dt / (PEAK_TFLOPS * 1e12), 2),
    }


def _last_loss_bump(loss, like):
    import jax.numpy as jnp

    return jnp.asarray(loss, like.dtype)


def bench_training_sharded(config_name: str = "512x256", iters: int = 3,
                           encoder_gat: bool = False):
    """S=1 sharded-path overhead: the SAME flagship train step through
    ``parallel.sharded_model.make_sharded_train_step`` on a (1, 1) mesh on
    the single real chip, vs the unsharded ``bench_training`` step.  This
    bounds the pure sharding-machinery overhead (shard_map, halo indexing,
    psum with one participant) with zero communication.

    ``encoder_gat=True`` swaps the encoder to a 2-head GATConv — the
    config family bench_gspmd_fallback measures through the GSPMD path
    (2310.9 ms); the shard_map bipartite GAT stack now covers it."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh

    from graphcast_lite_tpu import presets
    from graphcast_lite_tpu.graphs.build import build_graph_set
    from graphcast_lite_tpu.parallel.sharded_model import (
        ShardedWeatherForward, build_sharding_plan, make_sharded_train_step,
        plan_device_arrays,
    )
    from graphcast_lite_tpu.models.weather import ModelGraphs, WeatherModel
    from graphcast_lite_tpu.training.rollout import RolloutSpec

    if config_name == "64x32":
        cfg = presets.interaction_net_64x32()
        lat, lon = presets.wb2_64x32_grid()
    else:
        cfg = presets.interaction_net_512x256()
        lat, lon = presets.wb2_512x256_grid()
    if encoder_gat:
        from graphcast_lite_tpu.config import GATProps, GraphLayerType

        enc_gat = cfg.pipeline.encoder.gcn.model_copy(update={
            "layer_type": GraphLayerType.GATConv,
            "gat_props": GATProps(num_heads=2, sparsity_thresholds=[0.1]),
        })
        cfg = cfg.model_copy(update={"pipeline": cfg.pipeline.model_copy(
            update={"encoder": cfg.pipeline.encoder.model_copy(
                update={"gcn": enc_gat})})})
    n_feat, obs, ar = (cfg.data.num_features_used, cfg.data.obs_window_used,
                       cfg.max_ar_steps)
    gs = build_graph_set(lat, lon, cfg.graph.mesh_levels,
                         cfg.graph.grid2mesh_radius_query)
    graphs = ModelGraphs.from_graph_set(gs)
    model = WeatherModel(pipeline=cfg.pipeline, data=cfg.data,
                         num_grid_nodes=gs.num_grid_nodes,
                         num_mesh_nodes=gs.num_mesh_nodes)
    g = gs.num_grid_nodes
    spec = RolloutSpec(obs_window=obs, num_features=n_feat,
                       use_residual=True, remat=True)
    rng = np.random.RandomState(0)
    x0 = jnp.zeros((g, obs * n_feat), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, graphs)
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    # With one shard the whole model's per-step edge intermediates sit on
    # one chip: remat the sharded processor scan (costs ~1 extra processor
    # fwd per AR step, reported as part of the overhead — honest, since
    # S>=2 would not need it).  GCLT_S1_REMAT=none measures without it (the
    # remat-vs-machinery split); the env var is restored on exit so later
    # sharded work in this process keeps its own policy.
    prev_remat = os.environ.get("GCLT_SHARDED_SCAN_REMAT")
    if prev_remat is None:
        remat_mode = os.environ.get("GCLT_S1_REMAT", "full")
        os.environ["GCLT_SHARDED_SCAN_REMAT"] = remat_mode
    else:
        # A pre-set GCLT_SHARDED_SCAN_REMAT wins over GCLT_S1_REMAT; report
        # the mode that actually takes effect.
        remat_mode = prev_remat
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                ("data", "space"))
    plan = build_sharding_plan(gs, 1)
    arrs = plan_device_arrays(plan, gs)
    step = make_sharded_train_step(fwd=ShardedWeatherForward(
        cfg.pipeline, cfg.data, 1), spec=spec, mesh=mesh, optimizer=opt,
        steps=ar, compute_dtype=jnp.bfloat16)
    x = jnp.asarray(plan.scatter_grid(
        rng.randn(1, g, obs * n_feat).astype(np.float32)))
    y = jnp.asarray(plan.scatter_grid(
        rng.randn(1, g, ar * n_feat).astype(np.float32)))

    try:
        t0 = time.time()
        params, opt_state, loss = step(params, opt_state, x, y, arrs)
        _sync(loss)
        compile_s = time.time() - t0
        params, opt_state, loss = step(params, opt_state, x, y, arrs)
        _sync(loss)
        t0 = time.time()
        for _ in range(iters):
            params, opt_state, loss = step(params, opt_state, x, y, arrs)
        _sync(loss)
        dt = (time.time() - t0) / iters
    finally:
        if prev_remat is None:
            os.environ.pop("GCLT_SHARDED_SCAN_REMAT", None)
        else:
            os.environ["GCLT_SHARDED_SCAN_REMAT"] = prev_remat
    return {
        "sharded_s1_step_ms": round(dt * 1e3, 1),
        "compile_s": round(compile_s, 1),
        "loss": float(loss),
        "scan_remat": remat_mode,
    }


def bench_gspmd_fallback(iters: int = 3):
    """Perf number for the GSPMD-fallback model family (VERDICT r3 item 9):
    a GAT-ENCODER 512x256 config — which the explicit shard_map path does
    not cover (parallel/sharded_model guards route it to parallel/sharding's
    batch-axis GSPMD) — trained for one step through that exact path on a
    (1, 1) device mesh.  Bounds what "multi-chip training supported via
    GSPMD" costs for the attention-encoder family at flagship scale."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from graphcast_lite_tpu import presets
    from graphcast_lite_tpu.config import GATProps, GraphLayerType
    from graphcast_lite_tpu.graphs.build import build_graph_set
    from graphcast_lite_tpu.models.weather import ModelGraphs, WeatherModel
    from graphcast_lite_tpu.training.rollout import RolloutSpec, rollout_loss

    cfg = presets.interaction_net_512x256()
    enc = cfg.pipeline.encoder.gcn
    enc_gat = enc.model_copy(update={
        "layer_type": GraphLayerType.GATConv,
        "gat_props": GATProps(num_heads=2, sparsity_thresholds=[0.1]),
    })
    cfg = cfg.model_copy(update={"pipeline": cfg.pipeline.model_copy(
        update={"encoder": cfg.pipeline.encoder.model_copy(
            update={"gcn": enc_gat})})})
    lat, lon = presets.wb2_512x256_grid()
    n_feat, obs, ar = (cfg.data.num_features_used, cfg.data.obs_window_used,
                       cfg.max_ar_steps)
    gs = build_graph_set(lat, lon, cfg.graph.mesh_levels,
                         cfg.graph.grid2mesh_radius_query)
    graphs = ModelGraphs.from_graph_set(gs)
    model = WeatherModel(pipeline=cfg.pipeline, data=cfg.data,
                         num_grid_nodes=gs.num_grid_nodes,
                         num_mesh_nodes=gs.num_mesh_nodes)
    g = gs.num_grid_nodes
    spec = RolloutSpec(obs_window=obs, num_features=n_feat,
                       use_residual=True, remat=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, g, obs, n_feat).astype(np.float32))
    y = jnp.asarray(rng.randn(1, g, ar, n_feat).astype(np.float32))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x[0].reshape(g, obs * n_feat), graphs)
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)
    graphs = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, graphs)

    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                ("data", "space"))
    bsh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def loss_fn(params, window, targets, graphs):
        params_c = jax.tree.map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32 else p, params)

        def model_fn(inp, m, t, p):
            out, _ = jax.vmap(
                lambda xi: model.apply(params_c, xi, graphs, m, t, p)
            )(inp)
            return out, None

        loss, _ = rollout_loss(
            model_fn, window.astype(jnp.bfloat16),
            targets.astype(jnp.bfloat16), ar, spec)
        return loss.astype(jnp.float32)

    @functools.partial(
        jax.jit, donate_argnums=(0, 1),
        in_shardings=(rep, rep, bsh, bsh, rep),
        out_shardings=(rep, rep, rep),
    )
    def step(params, opt_state, x, y, graphs):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y, graphs)
        grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    params, opt_state, loss = step(params, opt_state, x, y, graphs)
    _sync(loss)
    compile_s = time.time() - t0
    params, opt_state, loss = step(params, opt_state, x, y, graphs)
    _sync(loss)
    t0 = time.time()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, x, y, graphs)
    _sync(loss)
    dt = (time.time() - t0) / iters
    return {
        "gspmd_gat_encoder_train_step_ms": round(dt * 1e3, 1),
        "compile_s": round(compile_s, 1),
        "loss": float(loss),
    }


def bench_amortized_64x32(k: int = 8, iters: int = 8):
    """Tunnel-dispatch amortization on the reference's benchmark grid: ONE
    jitted program chains K AR-4 rollouts (each feeding the next window),
    so the 64x32 workload pays 1/K of the per-dispatch tunnel cost
    (round-3 measured 65.6 ms dispatch vs 42 ms device time).  Reports both
    per-dispatch latency and amortized grid-points/s."""
    import jax
    import jax.numpy as jnp

    from graphcast_lite_tpu.training.rollout import rollout_predict

    dtype = jnp.bfloat16
    (fn, params, x, graphs, g, ar, gs, cfg, spec,
     model) = build("64x32", dtype)

    def chained(params, window, graphs):
        for _ in range(k):
            def model_fn(inp, m, t, p):
                out, _ = model.apply(params, inp, graphs, m, t, p)
                return out, None

            preds = rollout_predict(model_fn, window, ar, spec)
            window = jnp.concatenate(
                [window[:, 1:, :], preds[:, -1:, :].astype(window.dtype)],
                axis=1,
            )
        return window

    jfn = jax.jit(chained)
    t0 = time.time()
    w = jfn(params, x, graphs)
    _sync(w)
    compile_s = time.time() - t0
    w = jfn(params, w, graphs)
    _sync(w)
    t0 = time.time()
    for _ in range(iters):
        w = jfn(params, w, graphs)
    _sync(w)
    per_dispatch = (time.time() - t0) / iters
    per_rollout = per_dispatch / k
    return {
        "rollouts_per_dispatch": k,
        "dispatch_ms": round(per_dispatch * 1e3, 1),
        "rollout_ms_amortized": round(per_rollout * 1e3, 2),
        "grid_points_per_s_amortized": round(g * ar / per_rollout, 1),
        "compile_s": round(compile_s, 1),
    }


def train_matrix(cfgname: str = "512x256"):
    """The doc-reproducibility matrix (VERDICT r3 item 6): each documented
    train-step number is one cell here.  Env-flag variants are separate
    subprocesses (the flags are trace-time)."""
    import subprocess

    cells = {
        "default": {},
        "no_save_hpre": {"GCLT_FUSED_SAVE_HPRE": "0", "GCLT_ENCDEC_REMAT": "0"},
        "no_lazy_ln": {"GCLT_LAZY_EDGE": "0"},
        "bwd_ell": {"GCLT_FUSED_BWD": "ell"},
    }
    out = {}
    for name, env in cells.items():
        e = dict(os.environ, **env)
        r = subprocess.run(
            [sys.executable, __file__, "train", cfgname], env=e,
            capture_output=True, text=True, timeout=1800,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if line:
            d = json.loads(line[-1])
            out[name] = {"train_step_ms": d["extra"]["train_step_ms"],
                         "loss": d["extra"]["loss"], "env": env}
            print(f"[{name:>14}] {d['extra']['train_step_ms']:.1f} ms "
                  f"loss={d['extra']['loss']:.6f}")
        else:
            out[name] = {"error": r.stdout[-200:] + r.stderr[-200:]}
    print(json.dumps({"metric": f"train_matrix_{cfgname}", "value": 0.0,
                      "unit": "ms", "vs_baseline": 0.0, "extra": out}))
    return out


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    if only == "trainmatrix":
        train_matrix(sys.argv[2] if len(sys.argv) > 2 else "512x256")
        return
    if only == "amortized":
        res = bench_amortized_64x32()
        print(json.dumps({
            "metric": "grid_points_per_s_amortized_64x32",
            "value": res["grid_points_per_s_amortized"],
            "unit": "grid-points/s", "vs_baseline": 0.0, "extra": res,
        }))
        return
    if only == "gspmd":
        res = bench_gspmd_fallback()
        print(json.dumps({
            "metric": "gspmd_gat_encoder_train_step_ms_512x256",
            "value": res["gspmd_gat_encoder_train_step_ms"],
            "unit": "ms", "vs_baseline": 0.0, "extra": res,
        }))
        return
    if only == "train":
        cfgname = sys.argv[2] if len(sys.argv) > 2 else "512x256"
        res = bench_training(cfgname)
        print(json.dumps({
            "metric": f"train_grid_points_per_s_per_chip_{cfgname}_ar4",
            "value": round(res["train_grid_points_per_s"], 1),
            "unit": "grid-points/s", "vs_baseline": 0.0, "extra": res,
        }))
        return
    if only == "sharded":
        cfgname = sys.argv[2] if len(sys.argv) > 2 else "512x256"
        res = bench_training_sharded(cfgname)
        print(json.dumps({
            "metric": f"sharded_s1_step_ms_{cfgname}", "value":
            res["sharded_s1_step_ms"], "unit": "ms", "vs_baseline": 0.0,
            "extra": res,
        }))
        return
    if only == "gat_sharded":
        # The GAT-encoder family through the shard_map bipartite stacks —
        # direct A/B against bench.py gspmd (same config, GSPMD path).
        res = bench_training_sharded("512x256", encoder_gat=True)
        print(json.dumps({
            "metric": "sharded_s1_gat_encoder_step_ms_512x256",
            "value": res["sharded_s1_step_ms"], "unit": "ms",
            "vs_baseline": 0.0, "extra": res,
        }))
        return
    extra = {}
    res_small = None
    res_big = None
    if only in (None, "64x32"):
        try:
            # 30 back-to-back dispatches + one fetch: a lone 64x32 dispatch
            # is tunnel-RTT-dominated (dispatch_ms reports that separately).
            res_small = bench_config("64x32", iters=30, dtype_name="bf16")
            extra["64x32_bf16"] = res_small
        except Exception as e:  # keep the headline alive on partial failure
            extra["64x32_error"] = f"{type(e).__name__}: {e}"[:300]
        try:
            # K rollouts per dispatch: bounds the tunnel's share on the
            # reference's benchmark grid (VERDICT r3 item 10).
            extra["64x32_amortized"] = bench_amortized_64x32()
        except Exception as e:
            extra["64x32_amortized_error"] = f"{type(e).__name__}: {e}"[:300]
    if only in (None, "512x256"):
        try:
            res_big = bench_config("512x256", iters=8, dtype_name="bf16")
            extra["512x256_bf16"] = res_big
        except Exception as e:
            extra["512x256_error"] = f"{type(e).__name__}: {e}"[:300]
    if only is None:
        try:
            extra["512x256_train"] = bench_training("512x256")
        except Exception as e:
            extra["train_error"] = f"{type(e).__name__}: {e}"[:300]
        try:
            sh = bench_training_sharded("512x256")
            tr = extra.get("512x256_train")
            if tr:
                sh["overhead_vs_unsharded_pct"] = round(
                    100 * (sh["sharded_s1_step_ms"] / tr["train_step_ms"]
                           - 1), 1
                )
            extra["512x256_train_sharded_s1"] = sh
        except Exception as e:
            extra["sharded_error"] = f"{type(e).__name__}: {e}"[:300]
    if res_small is None and res_big is None:
        print(json.dumps({
            "metric": "grid_points_per_s_per_chip_512x256_ar4",
            "value": 0.0, "unit": "grid-points/s", "vs_baseline": 0.0,
            "extra": extra,
        }))
        return

    headline = res_big or res_small
    value = headline["grid_points_per_s"]
    print(json.dumps({
        "metric": "grid_points_per_s_per_chip_512x256_ar4"
        if res_big else "grid_points_per_s_per_chip_64x32_ar4",
        "value": round(value, 1),
        "unit": "grid-points/s",
        "vs_baseline": round(value / REFERENCE_THROUGHPUT_512, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
