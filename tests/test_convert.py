"""Round-trip tests for the torch checkpoint converter and legacy .pt loader."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphcast_lite_tpu.config import (
    DataConfig, ExperimentConfig, GATProps, GraphBlock, GraphBuildingConfig,
    GraphLayerType, Grid2MeshEdgeCreation, Mesh2GridEdgeCreation, MLPBlock,
    ModelConfig, PipelineConfig,
)
from graphcast_lite_tpu.utils.torch_convert import (
    convert_reference_checkpoint,
)


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _invert_to_torch_layout(params, pipeline):
    """Synthesize the torch state dict that would convert into `params`."""
    sd = {}

    def mlp_tower(prefix, tree, mlp_cfg):
        hidden = list(mlp_cfg.mlp_hidden_dims or [])
        idx = 0
        for i in range(len(hidden)):
            sd[f"{prefix}.MLP.{idx}.weight"] = tree[f"lin_{i}"]["kernel"].T
            sd[f"{prefix}.MLP.{idx}.bias"] = tree[f"lin_{i}"]["bias"]
            sd[f"{prefix}.MLP.{idx + 1}.weight"] = tree[f"prelu_{i}"]["alpha"]
            idx += 2
        last = f"lin_{len(hidden)}"
        sd[f"{prefix}.MLP.{idx}.weight"] = tree[last]["kernel"].T
        sd[f"{prefix}.MLP.{idx}.bias"] = tree[last]["bias"]
        idx += 1
        if mlp_cfg.use_layer_norm:
            sd[f"{prefix}.MLP.{idx}.weight"] = tree["norm"]["weight"]
            sd[f"{prefix}.MLP.{idx}.bias"] = tree["norm"]["bias"]

    def graph_layer(prefix, tree, cfg):
        lt = cfg.gcn.layer_type
        if lt == GraphLayerType.ConvGCN:
            hidden = list(cfg.gcn.hidden_dims or [])
            for i in range(len(hidden) + 1):
                sd[f"{prefix}.layers.{2 * i}.lin.weight"] = (
                    tree[f"conv_{i}"]["kernel"].T
                )
                sd[f"{prefix}.layers.{2 * i}.bias"] = tree[f"conv_{i}"]["bias"]
            if "act" in tree:
                sd[f"{prefix}.layers.1.weight"] = tree["act"]["alpha"]
        elif lt == GraphLayerType.InteractionNet:
            n = cfg.gcn.num_message_passing_steps or 4
            inet = tree["inet"]
            sd[f"{prefix}.layers.edge_encoder.0.weight"] = (
                inet["edge_encoder_lin"]["kernel"].T
            )
            sd[f"{prefix}.layers.edge_encoder.0.bias"] = (
                inet["edge_encoder_lin"]["bias"]
            )
            stacked = inet["steps"]["layer"]
            for i in range(n):
                for mlp in ("edge_mlp", "node_mlp"):
                    sd[f"{prefix}.layers.steps.{i}.{mlp}.0.weight"] = (
                        stacked[mlp]["lin_0"]["kernel"][i].T
                    )
                    sd[f"{prefix}.layers.steps.{i}.{mlp}.0.bias"] = (
                        stacked[mlp]["lin_0"]["bias"][i]
                    )
                    sd[f"{prefix}.layers.steps.{i}.{mlp}.2.weight"] = (
                        stacked[mlp]["lin_1"]["kernel"][i].T
                    )
                    sd[f"{prefix}.layers.steps.{i}.{mlp}.2.bias"] = (
                        stacked[mlp]["lin_1"]["bias"][i]
                    )
                for norm in ("edge_norm", "node_norm"):
                    sd[f"{prefix}.layers.steps.{i}.{norm}.weight"] = (
                        stacked[norm]["weight"][i]
                    )
                    sd[f"{prefix}.layers.steps.{i}.{norm}.bias"] = (
                        stacked[norm]["bias"][i]
                    )

    def model_block(prefix, tree, cfg):
        if cfg.mlp is not None:
            mlp_tower(f"{prefix}.mlp", tree["mlp"], cfg.mlp)
        graph_layer(prefix, tree["graph_layer"], cfg)

    p = params["params"]
    model_block("encoder", p["encoder"], pipeline.encoder)
    model_block("processor", p["processor"], pipeline.processor)
    model_block("decoder", p["decoder"], pipeline.decoder)
    return {k: np.asarray(v) for k, v in sd.items()}


def test_converter_round_trip(small_graph_set):
    gs = small_graph_set
    n_feat, obs, hidden = 5, 2, 16
    cfg = ExperimentConfig(
        graph=GraphBuildingConfig(
            grid2mesh_edge_creation=Grid2MeshEdgeCreation.RADIUS,
            grid2mesh_radius_query=0.6, mesh_levels=[1, 2],
            mesh2grid_edge_creation=Mesh2GridEdgeCreation.CONTAINED,
        ),
        pipeline=PipelineConfig(
            encoder=ModelConfig(
                mlp=MLPBlock(mlp_hidden_dims=[32], output_dim=hidden,
                             use_layer_norm=True, layer_norm_mode="node"),
                gcn=GraphBlock(layer_type=GraphLayerType.ConvGCN,
                               hidden_dims=[hidden], output_dim=hidden),
            ),
            processor=ModelConfig(
                gcn=GraphBlock(layer_type=GraphLayerType.InteractionNet,
                               output_dim=hidden,
                               num_message_passing_steps=3,
                               edge_feature_dim=4, activation="swish",
                               use_layer_norm=True),
            ),
            decoder=ModelConfig(
                gcn=GraphBlock(layer_type=GraphLayerType.ConvGCN,
                               hidden_dims=[hidden], output_dim=n_feat),
            ),
        ),
        data=DataConfig(dataset_name="x", num_features_used=n_feat,
                        obs_window_used=obs, pred_window_used=1,
                        want_feats_flattened=True),
    )
    from graphcast_lite_tpu.models.weather import ModelGraphs, WeatherModel

    graphs = ModelGraphs.from_graph_set(gs)
    model = WeatherModel(pipeline=cfg.pipeline, data=cfg.data,
                         num_grid_nodes=gs.num_grid_nodes,
                         num_mesh_nodes=gs.num_mesh_nodes)
    x = jnp.zeros((gs.num_grid_nodes, obs * n_feat))
    params = model.init(jax.random.PRNGKey(0), x, graphs)

    sd = _invert_to_torch_layout(jax.tree.map(np.asarray, params),
                                 cfg.pipeline)
    converted = convert_reference_checkpoint(sd, cfg)

    a = _flatten(jax.tree.map(np.asarray, params)["params"])
    b = _flatten(converted["params"])
    assert set(a.keys()) == set(b.keys()), (
        set(a) ^ set(b)
    )
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=1e-6, err_msg=k)

    # Converted params must run through the model.
    out, _ = model.apply(converted, x, graphs)
    assert out.shape == (gs.num_grid_nodes, n_feat)


def test_legacy_pt_loader(tmp_path):
    torch = pytest.importorskip("torch")
    from graphcast_lite_tpu.data.legacy_pt import load_pt_datasets

    n, g, obs, pred, f = 12, 50, 3, 2, 6
    rng = np.random.RandomState(0)
    torch.save(torch.tensor(rng.randn(n, g, obs, f).astype(np.float32)),
               tmp_path / "X_train.pt")
    torch.save(torch.tensor(rng.randn(n, g, pred, f).astype(np.float32)),
               tmp_path / "y_train.pt")
    torch.save(torch.tensor(rng.randn(6, g, obs, f).astype(np.float32)),
               tmp_path / "X_test.pt")
    torch.save(torch.tensor(rng.randn(6, g, pred, f).astype(np.float32)),
               tmp_path / "y_test.pt")

    train, val, test, meta = load_pt_datasets(
        str(tmp_path), obs_window_used=2, pred_window_used=2,
        num_features_used=4,
    )
    assert len(train) == 12 and len(val) == 3 and len(test) == 3
    x, y = train.get(0)
    assert x.shape == (g, 2 * 4)   # last 2 obs frames, first 4 features
    assert y.shape == (g, 2 * 4)
    assert meta.num_grid_nodes == g
