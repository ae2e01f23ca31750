"""Golden numeric regression: model outputs for fixed seeds/graphs are
snapshotted so accidental numerics changes (layer math, init, graph
ordering) are caught.  Regenerate with
``python -m tests.test_golden_regression`` after an INTENTIONAL change.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_outputs.json")


def _build(processor_type):
    from graphcast_lite_tpu.config import (
        DataConfig, GATProps, GraphBlock, GraphLayerType, MLPBlock,
        ModelConfig, PipelineConfig,
    )
    from graphcast_lite_tpu.graphs.build import build_graph_set
    from graphcast_lite_tpu.models.weather import ModelGraphs, WeatherModel

    lat = np.linspace(-75.0, 75.0, 8).astype(np.float32)
    lon = np.arange(0, 360, 30).astype(np.float32)
    gs = build_graph_set(lat, lon, [1, 2], grid2mesh_radius_query=0.6)
    n_feat, obs, hidden = 4, 2, 16
    lt = GraphLayerType(processor_type)
    if lt == GraphLayerType.InteractionNet:
        proc = GraphBlock(layer_type=lt, output_dim=hidden,
                          num_message_passing_steps=2, edge_feature_dim=4,
                          activation="swish", use_layer_norm=True)
    elif lt in (GraphLayerType.GATConv, GraphLayerType.SparseGATConv):
        proc = GraphBlock(layer_type=lt, hidden_dims=[hidden],
                          output_dim=hidden,
                          gat_props=GATProps(num_heads=2,
                                             sparsity_thresholds=[]))
    else:
        proc = GraphBlock(layer_type=lt, hidden_dims=[hidden],
                          output_dim=hidden)
    pipe = PipelineConfig(
        encoder=ModelConfig(
            mlp=MLPBlock(mlp_hidden_dims=[16], output_dim=hidden,
                         use_layer_norm=True, layer_norm_mode="node"),
            gcn=GraphBlock(layer_type=GraphLayerType.ConvGCN,
                           hidden_dims=[hidden], output_dim=hidden),
        ),
        processor=ModelConfig(gcn=proc),
        decoder=ModelConfig(
            gcn=GraphBlock(layer_type=GraphLayerType.ConvGCN,
                           hidden_dims=[hidden], output_dim=n_feat),
        ),
    )
    data = DataConfig(dataset_name="g", num_features_used=n_feat,
                      obs_window_used=obs, pred_window_used=1,
                      want_feats_flattened=True)
    model = WeatherModel(pipeline=pipe, data=data,
                         num_grid_nodes=gs.num_grid_nodes,
                         num_mesh_nodes=gs.num_mesh_nodes)
    graphs = ModelGraphs.from_graph_set(gs)
    x = jnp.asarray(
        np.random.RandomState(7).randn(gs.num_grid_nodes, obs * n_feat)
        .astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(123), x, graphs)
    out, _ = model.apply(params, x, graphs)
    return np.asarray(out)


PROCESSORS = ["conv_gcn", "conv_gat", "interaction_net", "simple_conv"]


def _fingerprint(out: np.ndarray):
    return {
        "mean": float(out.mean()),
        "std": float(out.std()),
        "abs_sum": float(np.abs(out).sum()),
        "corner": [float(v) for v in out[:2, :2].reshape(-1)],
    }


def test_golden_outputs():
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    for proc in PROCESSORS:
        out = _build(proc)
        fp = _fingerprint(out)
        ref = golden[proc]
        for key in ("mean", "std", "abs_sum"):
            np.testing.assert_allclose(
                fp[key], ref[key], rtol=5e-4,
                err_msg=f"{proc}.{key} drifted — intentional numerics "
                "change? regenerate goldens",
            )
        np.testing.assert_allclose(fp["corner"], ref["corner"], rtol=5e-3,
                                   atol=1e-5, err_msg=proc)


if __name__ == "__main__":
    # Regenerate goldens.
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    golden = {p: _fingerprint(_build(p)) for p in PROCESSORS}
    with open(GOLDEN_PATH, "w") as f:
        json.dump(golden, f, indent=1)
    print(f"regenerated {GOLDEN_PATH}")
