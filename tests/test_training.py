"""End-to-end training tests on synthetic data (small but complete)."""

import os

import jax
import numpy as np
import pytest

from graphcast_lite_tpu.config import (
    DataConfig,
    ExperimentConfig,
    GATProps,
    GraphBlock,
    GraphBuildingConfig,
    GraphLayerType,
    Grid2MeshEdgeCreation,
    Mesh2GridEdgeCreation,
    MLPBlock,
    ModelConfig,
    PipelineConfig,
)
from graphcast_lite_tpu.data.dataset import load_chunked_datasets
from graphcast_lite_tpu.data.synthetic import generate_synthetic_dataset
from graphcast_lite_tpu.graphs.build import build_graph_set
from graphcast_lite_tpu.models.weather import ModelGraphs, WeatherModel
from graphcast_lite_tpu.training.trainer import Trainer, TrainState


def small_experiment(tmp_path, processor_type=GraphLayerType.ConvGCN,
                     max_ar=2, n_feat=5, static=(3,), forcing=(4,),
                     direct_pred=0):
    """``direct_pred`` > 0 makes a DIRECT multi-step config: the decoder
    emits direct_pred * n_feat channels in one forward (reference
    wb2_64x32_15f_4pred pattern)."""
    data_dir = str(tmp_path / "data")
    generate_synthetic_dataset(
        data_dir, n_time=30, n_lon=16, n_lat=8, n_feat=n_feat,
        static_channels=list(static), forcing_channels=list(forcing),
    )
    if processor_type == GraphLayerType.InteractionNet:
        proc = GraphBlock(layer_type=processor_type, output_dim=16,
                          num_message_passing_steps=2, edge_feature_dim=4,
                          activation="swish", use_layer_norm=True)
    elif processor_type in (GraphLayerType.GATConv,
                            GraphLayerType.SparseGATConv):
        proc = GraphBlock(layer_type=processor_type, hidden_dims=[16],
                          output_dim=16, use_layer_norm=False,
                          gat_props=GATProps(num_heads=2,
                                             sparsity_thresholds=[0.1]))
    else:
        proc = GraphBlock(layer_type=processor_type, hidden_dims=[16],
                          output_dim=16, use_layer_norm=False)

    cfg = ExperimentConfig(
        batch_size=2,
        learning_rate=2e-3,
        num_epochs=4,
        max_ar_steps=max_ar,
        early_stopping_patience=10,
        static_channels=list(static),
        forcing_channels=list(forcing),
        graph=GraphBuildingConfig(
            grid2mesh_edge_creation=Grid2MeshEdgeCreation.RADIUS,
            grid2mesh_radius_query=0.6,
            mesh_levels=[1, 2],
            mesh2grid_edge_creation=Mesh2GridEdgeCreation.CONTAINED,
        ),
        pipeline=PipelineConfig(
            encoder=ModelConfig(
                mlp=MLPBlock(mlp_hidden_dims=[32], output_dim=16,
                             use_layer_norm=True, layer_norm_mode="node"),
                gcn=GraphBlock(layer_type=GraphLayerType.ConvGCN,
                               hidden_dims=[16], output_dim=16,
                               use_layer_norm=False),
            ),
            processor=ModelConfig(gcn=proc),
            decoder=ModelConfig(
                gcn=GraphBlock(layer_type=GraphLayerType.ConvGCN,
                               hidden_dims=[16],
                               output_dim=max(direct_pred, 1) * n_feat,
                               use_layer_norm=False),
            ),
        ),
        data=DataConfig(dataset_name="synthetic", num_features_used=n_feat,
                        obs_window_used=2, pred_window_used=max_ar,
                        want_feats_flattened=True),
        wandb_log=False,
    )
    train_ds, val_ds, test_ds, meta = load_chunked_datasets(
        data_dir, obs_window=2, pred_steps=max_ar, n_features=n_feat,
    )
    gs = build_graph_set(
        meta.coordinates[0], meta.coordinates[1],
        cfg.graph.mesh_levels, cfg.graph.grid2mesh_radius_query,
    )
    graphs = ModelGraphs.from_graph_set(gs)
    model = WeatherModel(
        pipeline=cfg.pipeline, data=cfg.data,
        num_grid_nodes=gs.num_grid_nodes, num_mesh_nodes=gs.num_mesh_nodes,
    )
    return cfg, model, graphs, train_ds, val_ds, test_ds, meta


@pytest.mark.parametrize("ptype", [
    GraphLayerType.ConvGCN,
    GraphLayerType.InteractionNet,
])
def test_training_reduces_loss(tmp_path, ptype):
    cfg, model, graphs, train_ds, val_ds, _, meta = small_experiment(
        tmp_path, processor_type=ptype
    )
    trainer = Trainer(model, graphs, cfg, meta, str(tmp_path / "results"))
    state = trainer.init_state(seed=0)
    results = trainer.fit(state, train_ds, val_ds, print_losses=False)
    assert len(results["train_losses"]) >= 2
    assert results["train_losses"][-1] < results["train_losses"][0]
    # Artifacts exist.
    assert os.path.exists(tmp_path / "results" / "best_model.msgpack")
    assert os.path.exists(tmp_path / "results" / "training_log.txt")
    assert os.path.exists(tmp_path / "results" / "results.json")
    assert os.path.exists(tmp_path / "results" / "checkpoint" / "meta.json")


def test_sparse_gat_training_prunes(tmp_path):
    cfg, model, graphs, train_ds, val_ds, _, meta = small_experiment(
        tmp_path, processor_type=GraphLayerType.SparseGATConv, max_ar=1
    )
    cfg = cfg.model_copy(update={"num_epochs": 7})
    trainer = Trainer(model, graphs, cfg, meta, str(tmp_path / "results"))
    state = trainer.init_state(seed=0)
    n_edges_before = float(np.asarray(state.edge_mask).sum())
    trainer.fit(state, train_ds, val_ds, print_losses=False,
                max_steps_per_epoch=3)
    n_edges_after = float(np.asarray(trainer.final_state.edge_mask).sum())
    # Threshold ramps from epoch 5; with 7 epochs at least one prune ran.
    assert n_edges_after <= n_edges_before


def test_checkpoint_resume(tmp_path):
    cfg, model, graphs, train_ds, val_ds, _, meta = small_experiment(tmp_path)
    cfg2 = cfg.model_copy(update={"num_epochs": 2})
    trainer = Trainer(model, graphs, cfg2, meta, str(tmp_path / "results"))
    state = trainer.init_state(seed=0)
    trainer.fit(state, train_ds, val_ds, print_losses=False,
                max_steps_per_epoch=2)

    # Resume for 2 more epochs.
    cfg3 = cfg.model_copy(update={"num_epochs": 4})
    trainer2 = Trainer(model, graphs, cfg3, meta, str(tmp_path / "results"))
    state2 = trainer2.init_state(seed=1)
    results = trainer2.fit(state2, train_ds, val_ds, resume=True,
                           print_losses=False, max_steps_per_epoch=2)
    assert len(results["train_losses"]) == 4


def test_carry_forward_channels(tmp_path):
    """Static channels must pass through the rollout untouched; forcing
    channels must follow the provided targets."""
    from graphcast_lite_tpu.training.rollout import (
        RolloutSpec, rollout_predict,
    )
    import jax.numpy as jnp

    cfg, model, graphs, train_ds, *_ = small_experiment(tmp_path)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((model.num_grid_nodes, 10)), graphs,
    )
    spec = RolloutSpec(obs_window=2, num_features=5, use_residual=True,
                       static_channels=(3,), forcing_channels=(4,))
    x, y = train_ds.get(0)
    window = jnp.asarray(x.reshape(1, -1, 2, 5))
    targets = jnp.asarray(y.reshape(1, -1, 2, 5))

    def model_fn(inp, m, t, p):
        out, mask = jax.vmap(
            lambda xi: model.apply(params, xi, graphs, m, t, p)
        )(inp)
        return out, None

    preds = rollout_predict(model_fn, window, 2, spec, forcing=targets)
    # preds: [1, G, P, C].  Static channel 3 equals the last input frame at
    # every step; forcing channel 4 equals the ground-truth targets.
    static_expect = np.asarray(window[:, :, -1, 3])[..., None]  # [1, G, 1]
    np.testing.assert_allclose(
        np.asarray(preds[..., 3]),
        np.broadcast_to(static_expect, preds[..., 3].shape),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(preds[..., 4]), np.asarray(targets[..., 4]), atol=1e-6
    )


def test_mixed_precision_training(tmp_path):
    """bf16-compute training (fp32 master params) must also converge."""
    cfg, model, graphs, train_ds, val_ds, _, meta = small_experiment(
        tmp_path, max_ar=1
    )
    cfg = cfg.model_copy(update={"num_epochs": 3})
    cfg.tpu.compute_dtype = "bfloat16"
    trainer = Trainer(model, graphs, cfg, meta, str(tmp_path / "results_mp"))
    state = trainer.init_state(seed=0)
    results = trainer.fit(state, train_ds, val_ds, print_losses=False)
    assert results["val_losses"][-1] < results["val_losses"][0]
    # Master params stayed fp32.
    import jax
    assert all(p.dtype == np.float32 or p.dtype == np.int32
               for p in jax.tree.leaves(trainer.final_state.params))


def test_batch4_vmap_matches_batch1_accumulation(tmp_path):
    """Batch=4 training (vmapped model; the Pallas kernel's batching rule
    folds batch into features) must produce the same loss as averaging the
    four per-sample (batch=1) losses, and the same loss as the sequential
    lax.map path (VERDICT r1 item 8)."""
    import os as _os

    cfg, model, graphs, train_ds, _, _, meta = small_experiment(
        tmp_path, processor_type=GraphLayerType.InteractionNet
    )
    trainer = Trainer(model, graphs, cfg, meta, str(tmp_path / "r"))

    xs, ys = zip(*[train_ds.get(i) for i in range(4)])
    x4 = np.stack(xs).astype(np.float32)
    y4 = np.stack(ys).astype(np.float32)

    def step_loss(x, y):
        # fresh state each call: the jitted step donates its state argument
        state = trainer.init_state(seed=0)
        _, loss = trainer.train_step(
            state, x, y, steps=cfg.max_ar_steps, thr=0.0, prune=False,
            freeze_processor=False,
        )
        return float(loss)

    loss_b4 = step_loss(x4, y4)
    per_sample = [step_loss(x4[i:i + 1], y4[i:i + 1]) for i in range(4)]
    np.testing.assert_allclose(loss_b4, np.mean(per_sample), rtol=2e-5)

    _os.environ["GCLT_BATCH_VMAP"] = "0"
    try:
        trainer_seq = Trainer(model, graphs, cfg, meta, str(tmp_path / "r2"))
        state = trainer_seq.init_state(seed=0)
        _, loss_seq = trainer_seq.train_step(
            state, x4, y4, steps=cfg.max_ar_steps, thr=0.0, prune=False,
            freeze_processor=False,
        )
        np.testing.assert_allclose(loss_b4, float(loss_seq), rtol=1e-6)
    finally:
        del _os.environ["GCLT_BATCH_VMAP"]
