"""Parity of the integrated sharded full-model path (parallel/sharded_model)
against the single-device WeatherModel on an 8-device CPU mesh.

Covers VERDICT r1 item 1: the FULL encode-process-decode forward, the AR
rollout loss, and the gradients must match the unsharded program to ≤1e-3
(same params, same inputs), in both gather and banded halo modes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graphcast_lite_tpu import presets
from graphcast_lite_tpu.graphs.build import build_graph_set
from graphcast_lite_tpu.models.weather import ModelGraphs, WeatherModel
from graphcast_lite_tpu.parallel.sharded_model import (
    ShardedWeatherForward,
    build_sharding_plan,
    make_sharded_eval_step,
    make_sharded_forward,
    make_sharded_train_step,
    plan_device_arrays,
)
from graphcast_lite_tpu.training.loss import weighted_mse
from graphcast_lite_tpu.training.rollout import RolloutSpec, rollout_loss

N_DEV = 8
N_FEAT, OBS, PRED, HIDDEN, MP = 5, 2, 2, 32, 2


def _mesh_2d(data=2):
    devs = np.asarray(jax.devices()[:N_DEV]).reshape(data, N_DEV // data)
    return Mesh(devs, axis_names=("data", "space"))


@pytest.fixture(scope="module")
def setup():
    cfg = presets.interaction_net_64x32(
        n_feat=N_FEAT, obs=OBS, pred=PRED, hidden=HIDDEN, mp_steps=MP
    )
    cfg.graph.mesh_levels = [1, 2]
    lat = np.linspace(-80, 80, 16).astype(np.float32)
    lon = np.arange(0, 360, 360 / 24).astype(np.float32)
    gs = build_graph_set(lat, lon, cfg.graph.mesh_levels,
                         cfg.graph.grid2mesh_radius_query)
    graphs = ModelGraphs.from_graph_set(gs)
    model = WeatherModel(
        pipeline=cfg.pipeline, data=cfg.data,
        num_grid_nodes=gs.num_grid_nodes, num_mesh_nodes=gs.num_mesh_nodes,
    )
    x0 = jnp.zeros((gs.num_grid_nodes, OBS * N_FEAT), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, graphs)
    return cfg, gs, graphs, model, params


@pytest.mark.parametrize("halo_mode", ["gather", "banded"])
def test_forward_parity(setup, halo_mode):
    cfg, gs, graphs, model, params = setup
    rng = np.random.RandomState(1)
    x = rng.randn(gs.num_grid_nodes, OBS * N_FEAT).astype(np.float32)

    expect, _ = model.apply(params, jnp.asarray(x), graphs)
    expect = np.asarray(expect)

    plan = build_sharding_plan(gs, N_DEV, halo_mode=halo_mode)
    arrs = plan_device_arrays(plan, gs)
    fwd = ShardedWeatherForward(cfg.pipeline, cfg.data, N_DEV)

    mesh = Mesh(np.asarray(jax.devices()[:N_DEV]).reshape(1, N_DEV),
                ("data", "space"))
    x_sh = plan.scatter_grid(x)
    run = make_sharded_forward(fwd, mesh)
    out_sh = run(params, jnp.asarray(x_sh[None]), arrs)
    got = plan.gather_grid(np.asarray(out_sh[0]))
    err = np.abs(got - expect).max()
    assert err < 1e-4, f"sharded full-model forward mismatch ({halo_mode}): {err}"


@pytest.mark.parametrize("halo_mode", ["gather", "banded"])
def test_train_step_parity(setup, halo_mode):
    """Loss and post-step params of the sharded train step match the
    unsharded rollout_loss + adam step."""
    cfg, gs, graphs, model, params = setup
    spec = RolloutSpec(obs_window=OBS, num_features=N_FEAT,
                       use_residual=True, remat=True)
    batch = 4
    rng = np.random.RandomState(2)
    x = rng.randn(batch, gs.num_grid_nodes, OBS * N_FEAT).astype(np.float32)
    y = rng.randn(batch, gs.num_grid_nodes, PRED * N_FEAT).astype(np.float32)

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    # --- unsharded reference step ---------------------------------------
    def loss_fn(params):
        window = x.reshape(batch, gs.num_grid_nodes, OBS, N_FEAT)
        targets = y.reshape(batch, gs.num_grid_nodes, PRED, N_FEAT)

        def model_fn(inp, m, t, p):
            out, _ = jax.vmap(
                lambda xi: model.apply(params, xi, graphs, m, t, p)
            )(inp)
            return out, None

        loss, _ = rollout_loss(model_fn, jnp.asarray(window),
                               jnp.asarray(targets), PRED, spec)
        return loss

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params)
    updates, _ = optimizer.update(ref_grads, opt_state, params)
    ref_params = optax.apply_updates(params, updates)

    # --- sharded step (data=2 × space=4 mesh) -----------------------------
    n_space = N_DEV // 2
    plan = build_sharding_plan(gs, n_space, halo_mode=halo_mode)
    arrs = plan_device_arrays(plan, gs)
    fwd = ShardedWeatherForward(cfg.pipeline, cfg.data, n_space)
    mesh = _mesh_2d(data=2)
    step = make_sharded_train_step(fwd, spec, mesh, optimizer, steps=PRED)

    x_sh = jnp.asarray(plan.scatter_grid(x))
    y_sh = jnp.asarray(plan.scatter_grid(y))
    # step donates its params/opt_state args; keep the fixture's alive.
    new_params, _, loss = step(
        jax.tree.map(jnp.copy, params), optimizer.init(params), x_sh, y_sh,
        arrs,
    )

    assert abs(float(loss) - float(ref_loss)) < 1e-4, (
        f"loss mismatch ({halo_mode}): sharded {float(loss)} vs "
        f"ref {float(ref_loss)}"
    )
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), new_params, ref_params
    )
    max_diff = max(jax.tree.leaves(diffs))
    assert max_diff < 1e-3, f"post-step param mismatch ({halo_mode}): {max_diff}"


def test_eval_step_parity(setup):
    cfg, gs, graphs, model, params = setup
    spec = RolloutSpec(obs_window=OBS, num_features=N_FEAT, use_residual=True)
    batch = 2
    rng = np.random.RandomState(3)
    x = rng.randn(batch, gs.num_grid_nodes, OBS * N_FEAT).astype(np.float32)
    y = rng.randn(batch, gs.num_grid_nodes, PRED * N_FEAT).astype(np.float32)

    # unsharded 1-step eval quantities
    window = x.reshape(batch, gs.num_grid_nodes, OBS, N_FEAT)
    out, _ = jax.vmap(
        lambda xi: model.apply(params, jnp.asarray(xi), graphs)
    )(jnp.asarray(x))
    out = jnp.asarray(window)[:, :, -1, :] + out
    tgt = jnp.asarray(y.reshape(batch, gs.num_grid_nodes, PRED, N_FEAT))[
        :, :, 0, :
    ]
    ref_loss = float(weighted_mse(out, tgt))
    ref_rmse = float(jnp.sqrt(jnp.mean(jnp.square(out - tgt))))

    n_space = N_DEV // 2
    plan = build_sharding_plan(gs, n_space)
    arrs = plan_device_arrays(plan, gs)
    fwd = ShardedWeatherForward(cfg.pipeline, cfg.data, n_space)
    mesh = _mesh_2d(data=2)
    ev = make_sharded_eval_step(fwd, spec, mesh)
    ones = jnp.ones(batch, jnp.float32)
    loss, acc, rmse = ev(params, jnp.asarray(plan.scatter_grid(x)),
                         jnp.asarray(plan.scatter_grid(y)), ones, arrs)
    assert abs(float(loss) - ref_loss) < 1e-5
    assert abs(float(rmse) - ref_rmse) < 1e-5
    assert -1.1 < float(acc) < 1.1

    # Partial batch: pad sample 1 with garbage + mask 0 — metrics must match
    # the batch-1 run exactly (padding-independence of the data sharding).
    x1 = np.stack([x[0], 13.0 + 0 * x[1]])
    y1 = np.stack([y[0], -7.0 + 0 * y[1]])
    m1 = jnp.asarray(np.array([1.0, 0.0], np.float32))
    l1, a1, r1 = ev(params, jnp.asarray(plan.scatter_grid(x1)),
                    jnp.asarray(plan.scatter_grid(y1)), m1, arrs)
    out0 = out[:1]
    tgt0 = tgt[:1]
    assert abs(float(l1) - float(weighted_mse(out0, tgt0))) < 1e-5
    assert abs(float(r1)
               - float(jnp.sqrt(jnp.mean(jnp.square(out0 - tgt0))))) < 1e-5


def test_gcn_processor_variant(setup):
    """The baseline GCN pipeline (encoder/processor/decoder all ConvGCN)
    also runs sharded with forward parity."""
    _, gs, _, _, _ = setup
    cfg = presets.baseline_gcn_64x32(n_feat=N_FEAT, obs=OBS, pred=1, hidden=16)
    cfg.graph.mesh_levels = [1, 2]
    graphs = ModelGraphs.from_graph_set(gs)
    model = WeatherModel(
        pipeline=cfg.pipeline, data=cfg.data,
        num_grid_nodes=gs.num_grid_nodes, num_mesh_nodes=gs.num_mesh_nodes,
    )
    x0 = jnp.zeros((gs.num_grid_nodes, OBS * N_FEAT), jnp.float32)
    params = model.init(jax.random.PRNGKey(5), x0, graphs)
    rng = np.random.RandomState(6)
    x = rng.randn(gs.num_grid_nodes, OBS * N_FEAT).astype(np.float32)
    expect = np.asarray(model.apply(params, jnp.asarray(x), graphs)[0])

    plan = build_sharding_plan(gs, N_DEV)
    arrs = plan_device_arrays(plan, gs)
    fwd = ShardedWeatherForward(cfg.pipeline, cfg.data, N_DEV)
    mesh = Mesh(np.asarray(jax.devices()[:N_DEV]).reshape(1, N_DEV),
                ("data", "space"))
    run = make_sharded_forward(fwd, mesh)
    out_sh = run(params, jnp.asarray(plan.scatter_grid(x)[None]), arrs)
    got = plan.gather_grid(np.asarray(out_sh[0]))
    err = np.abs(got - expect).max()
    assert err < 1e-4, f"GCN-pipeline sharded forward mismatch: {err}"


def test_comm_accounting_auto_select():
    """The auto halo selector picks banded only when it moves fewer rows,
    and the accounting is exact for both modes."""
    lat = np.linspace(-80, 80, 16).astype(np.float32)
    lon = np.arange(0, 360, 360 / 24).astype(np.float32)
    gs = build_graph_set(lat, lon, [1, 2], grid2mesh_radius_query=0.6)
    plan = build_sharding_plan(gs, N_DEV, halo_mode="auto")
    halo_name = "tiled" if plan.partition == "tiles" else "banded"
    for name in ("enc", "proc", "dec"):
        st = plan.comm_stats[name]
        assert st["chosen"] == (
            halo_name if st["banded"] < st["all_gather_baseline"]
            else "gather"
        )
        halos = getattr(plan, f"{name}_halos")
        assert (halos is not None) == (st["chosen"] == halo_name)


def test_trainer_mesh_path(tmp_path):
    """Trainer(mesh=...) trains the full model on a (data, space) CPU mesh
    and tracks the unsharded trainer's losses (same seed, same data order)."""
    from test_training import small_experiment

    from graphcast_lite_tpu.config import GraphLayerType
    from graphcast_lite_tpu.training.trainer import Trainer

    cfg, model, graphs, train_ds, val_ds, _, meta = small_experiment(
        tmp_path, processor_type=GraphLayerType.InteractionNet, max_ar=1
    )
    cfg = cfg.model_copy(update={"num_epochs": 2})
    gs = build_graph_set(
        meta.coordinates[0], meta.coordinates[1],
        cfg.graph.mesh_levels, cfg.graph.grid2mesh_radius_query,
    )
    mesh = Mesh(np.asarray(jax.devices()[:N_DEV]).reshape(2, N_DEV // 2),
                ("data", "space"))

    ref = Trainer(model, graphs, cfg, meta, str(tmp_path / "r_ref"))
    ref_res = ref.fit(ref.init_state(seed=0), train_ds, val_ds,
                      print_losses=False)

    tr = Trainer(model, graphs, cfg, meta, str(tmp_path / "r_sh"),
                 mesh=mesh, graph_set=gs)
    sh_res = tr.fit(tr.init_state(seed=0), train_ds, val_ds,
                    print_losses=False)

    for a, b in zip(ref_res["train_losses"], sh_res["train_losses"]):
        assert abs(a - b) < 5e-3 * max(abs(a), 1e-3), (ref_res, sh_res)
    for a, b in zip(ref_res["val_losses"], sh_res["val_losses"]):
        assert abs(a - b) < 5e-3 * max(abs(a), 1e-3), (ref_res, sh_res)


def test_predict_scaling_efficiency():
    """The analytic scaling-efficiency model (VERDICT r2 item 2): S=1 is
    exactly 1.0, efficiency is finite and positive for S>1, and communication
    bytes grow with S while per-shard compute shrinks."""
    from graphcast_lite_tpu.parallel.sharded_model import (
        predict_scaling_efficiency,
    )

    lat = np.linspace(-80, 80, 16).astype(np.float32)
    lon = np.arange(0, 360, 360 / 24).astype(np.float32)
    gs = build_graph_set(lat, lon, [1, 2], grid2mesh_radius_query=0.6)

    plan1 = build_sharding_plan(gs, 1, halo_mode="gather")
    e1 = predict_scaling_efficiency(plan1, t1_step_ms=1000.0)
    assert e1["efficiency"] == 1.0 and e1["comm_ms"] == 0.0

    prev_compute = None
    for s in (2, 4, 8):
        plan = build_sharding_plan(gs, s, halo_mode="auto")
        e = predict_scaling_efficiency(plan, t1_step_ms=1000.0)
        assert 0.0 < e["efficiency"] <= 1.0
        assert e["comm_ms"] > 0.0
        assert e["compute_ms"] == pytest.approx(1000.0 / s)
        if prev_compute is not None:
            assert e["compute_ms"] < prev_compute
        prev_compute = e["compute_ms"]


def test_weak_scaling_proxy_cpu_mesh():
    """CPU-mesh weak-scaling proxy (VERDICT r2 item 2c): the sharded train
    step runs at S=2 and S=8 on proportionally sized grids and reports the
    wall-clock ratio.  Virtual CPU devices share 2 physical cores, so no
    real speedup is possible — this asserts the sharded program SCALES IN
    PROBLEM SIZE at bounded time growth (weak-scaling shape), not hardware
    efficiency; the honest efficiency number comes from the analytic model
    + real-chip S=1 overhead (bench.py)."""
    import time

    cfg = presets.interaction_net_64x32(
        n_feat=N_FEAT, obs=OBS, pred=1, hidden=HIDDEN, mp_steps=MP
    )
    cfg.graph.mesh_levels = [1, 2]
    spec = RolloutSpec(obs_window=OBS, num_features=N_FEAT,
                       use_residual=True, remat=False)

    def run(s_n, n_lat):
        lat = np.linspace(-80, 80, n_lat).astype(np.float32)
        lon = np.arange(0, 360, 360 / 24).astype(np.float32)
        gs = build_graph_set(lat, lon, [1, 2],
                             cfg.graph.grid2mesh_radius_query)
        graphs = ModelGraphs.from_graph_set(gs)
        model = WeatherModel(
            pipeline=cfg.pipeline, data=cfg.data,
            num_grid_nodes=gs.num_grid_nodes,
            num_mesh_nodes=gs.num_mesh_nodes,
        )
        x0 = jnp.zeros((gs.num_grid_nodes, OBS * N_FEAT), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x0, graphs)
        mesh = Mesh(np.asarray(jax.devices()[:s_n]).reshape(1, s_n),
                    ("data", "space"))
        plan = build_sharding_plan(gs, s_n)
        arrs = plan_device_arrays(plan, gs)
        fwd = ShardedWeatherForward(cfg.pipeline, cfg.data, s_n)
        step = make_sharded_train_step(
            fwd, spec, mesh, optax.adam(1e-3), steps=1
        )
        rng = np.random.RandomState(0)
        x = jnp.asarray(plan.scatter_grid(
            rng.randn(1, gs.num_grid_nodes, OBS * N_FEAT).astype(np.float32)))
        y = jnp.asarray(plan.scatter_grid(
            rng.randn(1, gs.num_grid_nodes, N_FEAT).astype(np.float32)))
        opt_state = optax.adam(1e-3).init(params)
        params, opt_state, loss = step(params, opt_state, x, y, arrs)
        jax.block_until_ready(loss)  # compile outside timing
        t0 = time.time()
        for _ in range(3):
            params, opt_state, loss = step(params, opt_state, x, y, arrs)
        jax.block_until_ready(loss)
        return (time.time() - t0) / 3, gs.num_grid_nodes

    t2, n2 = run(2, 8)     # 2 shards,  8x24 grid
    t8, n8 = run(8, 32)    # 8 shards, 32x24 grid (4x nodes, 4x shards)
    assert n8 == 4 * n2
    # Weak-scaling shape: 4x the problem on 4x the (virtual) shards should
    # not blow up superlinearly even on 2 shared physical cores.
    assert t8 < 12 * t2, (t2, t8)


def test_train_step_parity_kernel_path(setup, monkeypatch):
    """The kernel-faithful sharded path (Pallas segment + fused edge unit,
    force-enabled -> interpret mode on CPU) matches the unsharded step."""
    monkeypatch.setenv("GCLT_SHARDED_KERNELS", "1")
    cfg, gs, graphs, model, params = setup
    spec = RolloutSpec(obs_window=OBS, num_features=N_FEAT,
                       use_residual=True, remat=True)
    batch = 2
    rng = np.random.RandomState(7)
    x = rng.randn(batch, gs.num_grid_nodes, OBS * N_FEAT).astype(np.float32)
    y = rng.randn(batch, gs.num_grid_nodes, PRED * N_FEAT).astype(np.float32)
    optimizer = optax.adam(1e-3)

    def loss_fn(params):
        window = x.reshape(batch, gs.num_grid_nodes, OBS, N_FEAT)
        targets = y.reshape(batch, gs.num_grid_nodes, PRED, N_FEAT)

        def model_fn(inp, m, t, p):
            out, _ = jax.vmap(
                lambda xi: model.apply(params, xi, graphs, m, t, p)
            )(inp)
            return out, None

        loss, _ = rollout_loss(model_fn, jnp.asarray(window),
                               jnp.asarray(targets), PRED, spec)
        return loss

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params)
    updates, _ = optimizer.update(ref_grads, optimizer.init(params), params)
    ref_params = optax.apply_updates(params, updates)

    n_space = N_DEV // 2
    plan = build_sharding_plan(gs, n_space, halo_mode="banded")
    arrs = plan_device_arrays(plan, gs)
    fwd = ShardedWeatherForward(cfg.pipeline, cfg.data, n_space)
    step = make_sharded_train_step(fwd, spec, _mesh_2d(data=2), optimizer,
                                   steps=PRED)
    new_params, _, loss = step(
        jax.tree.map(jnp.copy, params), optimizer.init(params),
        jnp.asarray(plan.scatter_grid(x)), jnp.asarray(plan.scatter_grid(y)),
        arrs,
    )
    assert abs(float(loss) - float(ref_loss)) < 1e-4
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), new_params, ref_params
    )
    assert max(jax.tree.leaves(diffs)) < 1e-3


def test_forward_parity_tiled(setup):
    """2-D tile partition (shared work-balanced boundaries, per-direction
    ppermute slabs) matches the single-device model."""
    cfg, gs, graphs, model, params = setup
    rng = np.random.RandomState(11)
    x = rng.randn(gs.num_grid_nodes, OBS * N_FEAT).astype(np.float32)
    expect, _ = model.apply(params, jnp.asarray(x), graphs)

    plan = build_sharding_plan(gs, N_DEV, partition="tiles")
    assert plan.partition == "tiles"
    arrs = plan_device_arrays(plan, gs)
    fwd = ShardedWeatherForward(cfg.pipeline, cfg.data, N_DEV)
    mesh = Mesh(np.asarray(jax.devices()[:N_DEV]).reshape(1, N_DEV),
                ("data", "space"))
    run = make_sharded_forward(fwd, mesh)
    out_sh = run(params, jnp.asarray(plan.scatter_grid(x)[None]), arrs)
    got = plan.gather_grid(np.asarray(out_sh[0]))
    err = np.abs(got - np.asarray(expect)).max()
    assert err < 1e-4, f"tiled sharded forward mismatch: {err}"


def test_train_step_parity_tiled(setup):
    """Tiled train step: loss parity vs the unsharded reference."""
    cfg, gs, graphs, model, params = setup
    spec = RolloutSpec(obs_window=OBS, num_features=N_FEAT,
                       use_residual=True, remat=True)
    batch = 2
    rng = np.random.RandomState(12)
    x = rng.randn(batch, gs.num_grid_nodes, OBS * N_FEAT).astype(np.float32)
    y = rng.randn(batch, gs.num_grid_nodes, PRED * N_FEAT).astype(np.float32)
    optimizer = optax.adam(1e-3)

    def loss_fn(params):
        window = x.reshape(batch, gs.num_grid_nodes, OBS, N_FEAT)
        targets = y.reshape(batch, gs.num_grid_nodes, PRED, N_FEAT)

        def model_fn(inp, m, t, p):
            out, _ = jax.vmap(
                lambda xi: model.apply(params, xi, graphs, m, t, p)
            )(inp)
            return out, None

        loss, _ = rollout_loss(model_fn, jnp.asarray(window),
                               jnp.asarray(targets), PRED, spec)
        return loss

    ref_loss = float(loss_fn(params))
    n_space = N_DEV // 2
    plan = build_sharding_plan(gs, n_space, partition="tiles")
    arrs = plan_device_arrays(plan, gs)
    fwd = ShardedWeatherForward(cfg.pipeline, cfg.data, n_space)
    step = make_sharded_train_step(fwd, spec, _mesh_2d(data=2), optimizer,
                                   steps=PRED)
    _, _, loss = step(
        jax.tree.map(jnp.copy, params), optimizer.init(params),
        jnp.asarray(plan.scatter_grid(x)), jnp.asarray(plan.scatter_grid(y)),
        arrs,
    )
    assert abs(float(loss) - ref_loss) < 1e-4, (float(loss), ref_loss)


def _gat_setup(sparse):
    from graphcast_lite_tpu.config import GATProps, GraphBlock, GraphLayerType, ModelConfig

    cfg = presets.interaction_net_64x32(
        n_feat=N_FEAT, obs=OBS, pred=PRED, hidden=HIDDEN, mp_steps=MP
    )
    cfg.graph.mesh_levels = [1, 2]
    lt = (GraphLayerType.SparseGATConv if sparse else GraphLayerType.GATConv)
    cfg.pipeline.processor = ModelConfig(
        gcn=GraphBlock(
            layer_type=lt,
            hidden_dims=None if sparse else [HIDDEN],
            output_dim=HIDDEN, use_layer_norm=False,
            gat_props=GATProps(num_heads=2, sparsity_thresholds=[0.1]),
        )
    )
    lat = np.linspace(-80, 80, 16).astype(np.float32)
    lon = np.arange(0, 360, 360 / 24).astype(np.float32)
    gs = build_graph_set(lat, lon, cfg.graph.mesh_levels,
                         cfg.graph.grid2mesh_radius_query)
    graphs = ModelGraphs.from_graph_set(gs)
    model = WeatherModel(
        pipeline=cfg.pipeline, data=cfg.data,
        num_grid_nodes=gs.num_grid_nodes, num_mesh_nodes=gs.num_mesh_nodes,
    )
    x0 = jnp.zeros((gs.num_grid_nodes, OBS * N_FEAT), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, graphs)
    return cfg, gs, graphs, model, params


def test_gat_forward_parity():
    """Sharded GAT processor (VERDICT r2 item 7) matches single-device."""
    cfg, gs, graphs, model, params = _gat_setup(sparse=False)
    rng = np.random.RandomState(20)
    x = rng.randn(gs.num_grid_nodes, OBS * N_FEAT).astype(np.float32)
    expect, _ = model.apply(params, jnp.asarray(x), graphs)

    plan = build_sharding_plan(gs, N_DEV)
    arrs = plan_device_arrays(plan, gs)
    fwd = ShardedWeatherForward(cfg.pipeline, cfg.data, N_DEV)
    mesh = Mesh(np.asarray(jax.devices()[:N_DEV]).reshape(1, N_DEV),
                ("data", "space"))
    run = make_sharded_forward(fwd, mesh)
    out_sh = run(params, jnp.asarray(plan.scatter_grid(x)[None]), arrs)
    got = plan.gather_grid(np.asarray(out_sh[0]))
    err = np.abs(got - np.asarray(expect)).max()
    assert err < 1e-4, f"sharded GAT forward mismatch: {err}"


def test_sparse_gat_train_step_parity():
    """Sharded SparseGAT train step: loss parity, pruning mask threads
    through the sharded TrainState layout, pruned-edge counts match."""
    cfg, gs, graphs, model, params = _gat_setup(sparse=True)
    spec = RolloutSpec(obs_window=OBS, num_features=N_FEAT,
                       use_residual=True, remat=True)
    batch = 2
    thr = 0.02
    rng = np.random.RandomState(21)
    x = rng.randn(batch, gs.num_grid_nodes, OBS * N_FEAT).astype(np.float32)
    y = rng.randn(batch, gs.num_grid_nodes, PRED * N_FEAT).astype(np.float32)
    optimizer = optax.adam(1e-3)

    def loss_fn(params):
        window = x.reshape(batch, gs.num_grid_nodes, OBS, N_FEAT)
        targets = y.reshape(batch, gs.num_grid_nodes, PRED, N_FEAT)

        def model_fn(inp, m, t, p):
            out, masks = jax.vmap(
                lambda xi: model.apply(params, xi, graphs, m, t, p),
                in_axes=(0, None, None, None),
            )(inp, m, t, p) if False else jax.vmap(
                lambda xi: model.apply(params, xi, graphs, m, t, p)
            )(inp)
            return out, jax.tree.map(lambda a: a[0], masks)

        loss, new_mask = rollout_loss(
            model_fn, jnp.asarray(window), jnp.asarray(targets), PRED, spec,
            edge_mask=graphs.processing.edge_mask,
            attention_threshold=thr, prune=True,
        )
        return loss, new_mask

    (ref_loss, ref_mask), _ = jax.value_and_grad(loss_fn, has_aux=True)(
        params
    )

    n_space = N_DEV // 2
    plan = build_sharding_plan(gs, n_space)
    arrs = plan_device_arrays(plan, gs)
    fwd = ShardedWeatherForward(cfg.pipeline, cfg.data, n_space)
    assert fwd.sparse_gat
    step = make_sharded_train_step(fwd, spec, _mesh_2d(data=2), optimizer,
                                   steps=PRED, prune=True)
    _, _, loss, new_mask = step(
        jax.tree.map(jnp.copy, params), optimizer.init(params),
        jnp.asarray(plan.scatter_grid(x)), jnp.asarray(plan.scatter_grid(y)),
        arrs, arrs.proc.edge_mask, jnp.asarray(thr),
    )
    assert abs(float(loss) - float(ref_loss)) < 1e-4, (
        float(loss), float(ref_loss)
    )
    # pruning happened and the surviving-edge count matches the unsharded
    # prune (same alphas, same threshold; sharded layout has its own padding)
    ref_kept = int(np.asarray(ref_mask).sum())
    sh_kept = int(np.asarray(new_mask).sum())
    total = int(np.asarray(graphs.processing.edge_mask).sum())
    assert ref_kept < total, "test should actually prune edges"
    assert abs(sh_kept - ref_kept) <= max(2, total // 500), (
        sh_kept, ref_kept, total
    )


def test_sharded_forward_threads_edge_mask():
    """make_sharded_forward must actually APPLY a supplied processing-edge
    mask (ADVICE r3: it used to silently fall back to the unpruned plan
    mask): the plan's own mask reproduces the unmasked call, an all-zero
    mask changes the output and matches the single-chip model under the
    same all-zero mask."""
    cfg, gs, graphs, model, params = _gat_setup(sparse=True)
    rng = np.random.RandomState(31)
    x = rng.randn(gs.num_grid_nodes, OBS * N_FEAT).astype(np.float32)

    n_space = N_DEV // 2
    plan = build_sharding_plan(gs, n_space)
    arrs = plan_device_arrays(plan, gs)
    fwd = ShardedWeatherForward(cfg.pipeline, cfg.data, n_space)
    mesh = Mesh(np.asarray(jax.devices()[:n_space]).reshape(1, n_space),
                ("data", "space"))
    run = make_sharded_forward(fwd, mesh)

    xb = jnp.asarray(plan.scatter_grid(x)[None])
    out_plain = np.asarray(run(params, xb, arrs)[0])
    out_same = np.asarray(run(params, xb, arrs, arrs.proc.edge_mask)[0])
    np.testing.assert_allclose(out_same, out_plain, atol=1e-6)

    zero_mask = jnp.zeros_like(arrs.proc.edge_mask)
    out_zero = plan.gather_grid(
        np.asarray(run(params, xb, arrs, zero_mask)[0])
    )
    assert np.abs(out_zero - plan.gather_grid(out_plain)).max() > 1e-4, (
        "mask was ignored"
    )
    expect_zero = np.asarray(model.apply(
        params, jnp.asarray(x), graphs,
        jnp.zeros_like(graphs.processing.edge_mask),
    )[0])
    err = np.abs(out_zero - expect_zero).max()
    assert err < 1e-4, f"masked sharded forward mismatch: {err}"


def test_hbm_accounting_calibration():
    """estimate_sharded_hbm must reproduce the MEASURED S=1 remat-free OOM
    request (19.7 GB at 512x256/[4,6]/h256/mp12/AR4, bench r4) within 25%,
    show the with-remat S=1 body fitting the 15.75 GB budget (it runs on
    the chip), and show the remat-free S>=4 body far under 16 GB — the
    arithmetic behind the expected-overhead scaling band."""
    from graphcast_lite_tpu import presets
    from graphcast_lite_tpu.graphs.build import build_graph_set
    from graphcast_lite_tpu.parallel.sharded_model import (
        build_sharding_plan,
        estimate_sharded_hbm,
    )

    lat, lon = presets.wb2_512x256_grid()
    fl = build_graph_set(lat, lon, [4, 6], 0.6)

    p1 = build_sharding_plan(fl, 1, halo_mode="auto")
    free = estimate_sharded_hbm(p1, scan_remat=False)["total_gb"]
    assert abs(free - 19.7) / 19.7 < 0.25, free       # measured OOM request
    withremat = estimate_sharded_hbm(p1, scan_remat=True)["total_gb"]
    assert withremat < 15.75, withremat               # measured: it runs

    for s in (4, 8):
        ps = build_sharding_plan(fl, s, halo_mode="auto")
        est = estimate_sharded_hbm(ps, scan_remat=False)
        assert est["total_gb"] < 16.0 * 0.5, est      # 2x margin


def _full_gat_setup():
    """Attention model end-to-end: GAT encoder, GAT processor, GAT decoder
    (the family that previously fell back to GSPMD for enc/dec)."""
    from graphcast_lite_tpu.config import (
        GATProps,
        GraphBlock,
        GraphLayerType,
        ModelConfig,
    )

    cfg = presets.interaction_net_64x32(
        n_feat=N_FEAT, obs=OBS, pred=PRED, hidden=HIDDEN, mp_steps=MP
    )
    cfg.graph.mesh_levels = [1, 2]
    gat = dict(layer_type=GraphLayerType.GATConv, output_dim=HIDDEN,
               use_layer_norm=False,
               gat_props=GATProps(num_heads=2, sparsity_thresholds=[0.1]))
    cfg.pipeline.encoder = ModelConfig(
        mlp=cfg.pipeline.encoder.mlp,
        gcn=GraphBlock(hidden_dims=[HIDDEN], **gat),
    )
    cfg.pipeline.processor = ModelConfig(
        gcn=GraphBlock(hidden_dims=[HIDDEN], **gat)
    )
    dec = dict(gat)
    dec["output_dim"] = N_FEAT
    cfg.pipeline.decoder = ModelConfig(
        gcn=GraphBlock(hidden_dims=[HIDDEN], **dec)
    )
    lat = np.linspace(-80, 80, 16).astype(np.float32)
    lon = np.arange(0, 360, 360 / 24).astype(np.float32)
    gs = build_graph_set(lat, lon, cfg.graph.mesh_levels,
                         cfg.graph.grid2mesh_radius_query)
    graphs = ModelGraphs.from_graph_set(gs)
    model = WeatherModel(
        pipeline=cfg.pipeline, data=cfg.data,
        num_grid_nodes=gs.num_grid_nodes, num_mesh_nodes=gs.num_mesh_nodes,
    )
    x0 = jnp.zeros((gs.num_grid_nodes, OBS * N_FEAT), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, graphs)
    return cfg, gs, graphs, model, params


def test_gat_encoder_decoder_forward_parity():
    """Sharded bipartite GAT enc/dec stacks (VERDICT r4 task 8) match the
    single-device attention model end-to-end."""
    cfg, gs, graphs, model, params = _full_gat_setup()
    rng = np.random.RandomState(21)
    x = rng.randn(gs.num_grid_nodes, OBS * N_FEAT).astype(np.float32)
    expect, _ = model.apply(params, jnp.asarray(x), graphs)

    plan = build_sharding_plan(gs, N_DEV)
    arrs = plan_device_arrays(plan, gs)
    fwd = ShardedWeatherForward(cfg.pipeline, cfg.data, N_DEV)
    mesh = Mesh(np.asarray(jax.devices()[:N_DEV]).reshape(1, N_DEV),
                ("data", "space"))
    run = make_sharded_forward(fwd, mesh)
    out_sh = run(params, jnp.asarray(plan.scatter_grid(x)[None]), arrs)
    got = plan.gather_grid(np.asarray(out_sh[0]))
    err = np.abs(got - np.asarray(expect)).max()
    assert err < 1e-4, f"sharded GAT enc/dec forward mismatch: {err}"


def test_gat_encoder_decoder_train_step_parity():
    """Full-GAT model: sharded train-step loss matches the single-device
    rollout loss (gradient path through the bipartite attention stacks)."""
    import optax

    from graphcast_lite_tpu.training.rollout import RolloutSpec, rollout_loss

    cfg, gs, graphs, model, params = _full_gat_setup()
    spec = RolloutSpec(obs_window=OBS, num_features=N_FEAT,
                       use_residual=True, remat=True)
    optimizer = optax.adam(1e-3)
    rng = np.random.RandomState(22)
    batch = 2
    x = rng.randn(batch, gs.num_grid_nodes, OBS * N_FEAT).astype(np.float32)
    y = rng.randn(batch, gs.num_grid_nodes, PRED * N_FEAT).astype(np.float32)

    def loss_fn(params):
        window = x.reshape(batch, gs.num_grid_nodes, OBS, N_FEAT)
        targets = y.reshape(batch, gs.num_grid_nodes, PRED, N_FEAT)

        def model_fn(inp, m, t, p):
            out, _ = jax.vmap(
                lambda xi: model.apply(params, xi, graphs, m, t, p)
            )(inp)
            return out, None

        loss, _ = rollout_loss(model_fn, jnp.asarray(window),
                               jnp.asarray(targets), PRED, spec)
        return loss

    ref_loss = float(loss_fn(params))
    n_space = N_DEV // 2
    plan = build_sharding_plan(gs, n_space)
    arrs = plan_device_arrays(plan, gs)
    fwd = ShardedWeatherForward(cfg.pipeline, cfg.data, n_space)
    step = make_sharded_train_step(fwd, spec, _mesh_2d(data=2), optimizer,
                                   steps=PRED)
    _, _, loss = step(
        jax.tree.map(jnp.copy, params), optimizer.init(params),
        jnp.asarray(plan.scatter_grid(x)), jnp.asarray(plan.scatter_grid(y)),
        arrs,
    )
    assert abs(float(loss) - ref_loss) < 1e-4, (float(loss), ref_loss)
