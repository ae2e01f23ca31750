"""Numeric parity against the REAL torch_geometric stack (VERDICT r4
Missing #4): the in-tree executed parity test (tests/test_torch_parity.py)
runs against a pure-torch executor (tests/torch_reference.py) because this
build environment has no torch_geometric; a shared misreading of PyG
semantics would pass it.  This module closes that hole with two checks that
run wherever PyG IS importable (see tests/requirements-parity.txt for the
pinned install + command) and skip cleanly otherwise:

1. ``test_torch_reference_matches_real_pyg`` — builds the flagship model
   twice, once from real PyG layers (GCNConv, LayerNorm(mode=...),
   utils.scatter — exactly the reference's imports, src/models.py:21,
   :183-236) and once from the in-tree executor, shares ONE set of weights,
   and asserts allclose over a 4-AR-step rollout.  This certifies the
   executor's reading of PyG semantics (gcn_norm with implicit self-loops,
   graph- vs node-mode LayerNorm, scatter-mean zero-degree behavior).
2. ``test_jax_matches_real_pyg`` — converts the PyG model's weights with
   ``utils.torch_convert`` and asserts the JAX model reproduces the PyG
   rollout (the BASELINE.json acceptance, now against the actual stack).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("torch_geometric")

import torch.nn as nn  # noqa: E402

from torch_reference import (  # noqa: E402
    WeatherPredictionRef,
    reference_state_dict_keys_remap,
)

N_FEAT, OBS, AR = 33, 2, 4
HIDDEN, MP = 64, 3


# ---------------------------------------------------------------- PyG twin
# Module tree mirrors torch_reference.WeatherPredictionRef attribute-for-
# attribute so state_dicts are key-compatible (PyG GCNConv stores lin.weight
# + bias; PyG LayerNorm stores weight + bias — same names as the executor).


class _PygMLP(nn.Module):
    def __init__(self, in_dim, hidden_dims, out_dim, use_layer_norm,
                 norm_mode="node"):
        super().__init__()
        from torch_geometric.nn import LayerNorm as PygLayerNorm

        mods = []
        d = in_dim
        for h in hidden_dims:
            mods += [nn.Linear(d, h), nn.PReLU()]
            d = h
        mods.append(nn.Linear(d, out_dim))
        if use_layer_norm:
            mods.append(PygLayerNorm(out_dim, mode=norm_mode))
        self.MLP = nn.ModuleList(mods)

    def forward(self, x):
        for m in self.MLP:
            x = m(x)
        return x


class _PygGCNStack(nn.Module):
    def __init__(self, in_dim, hidden_dims, out_dim):
        super().__init__()
        from torch_geometric.nn import GCNConv

        dims = list(hidden_dims) + [out_dim]
        mods = []
        shared_act = nn.PReLU()
        d = in_dim
        for i, h in enumerate(dims):
            mods.append(GCNConv(d, h))
            if i < len(dims) - 1:
                mods.append(shared_act)
            d = h
        self.layers = nn.ModuleList(mods)

    def forward(self, x, edge_index):
        from torch_geometric.nn import GCNConv

        for m in self.layers:
            x = m(x, edge_index) if isinstance(m, GCNConv) else m(x)
        return x


class _PygInteractionStep(nn.Module):
    """Reference InteractionNetLayer verbatim (src/models.py:166-236)."""

    def __init__(self, d, de, hidden):
        super().__init__()
        from torch_geometric.nn import LayerNorm as PygLayerNorm

        self.edge_mlp = nn.Sequential(
            nn.Linear(2 * d + de, hidden), nn.SiLU(), nn.Linear(hidden, de)
        )
        self.node_mlp = nn.Sequential(
            nn.Linear(d + de, hidden), nn.SiLU(), nn.Linear(hidden, d)
        )
        self.edge_norm = PygLayerNorm(de, mode="graph")
        self.node_norm = PygLayerNorm(d, mode="node")

    def forward(self, x, e, edge_index):
        from torch_geometric.utils import scatter

        snd, rcv = edge_index[0], edge_index[1]
        e_upd = self.edge_mlp(torch.cat([x[snd], x[rcv], e], dim=-1))
        agg = scatter(e_upd, rcv, dim=0, dim_size=x.size(0), reduce="mean")
        n_upd = self.node_mlp(torch.cat([x, agg], dim=-1))
        return self.node_norm(x + n_upd), self.edge_norm(e + e_upd)


class _PygInteractionProcessor(nn.Module):
    def __init__(self, d, raw_edge_dim, hidden, num_steps):
        super().__init__()
        self.edge_encoder = nn.Sequential(
            nn.Linear(raw_edge_dim, d), nn.SiLU()
        )
        self.steps = nn.ModuleList(
            [_PygInteractionStep(d, d, hidden) for _ in range(num_steps)]
        )

    def forward(self, x, edge_index, edge_attr):
        e = self.edge_encoder(edge_attr)
        for step in self.steps:
            x, e = step(x, e, edge_index)
        return x


class _PygEncDec(nn.Module):
    def __init__(self, in_dim, mlp_spec, gcn_hidden, gcn_out):
        super().__init__()
        d = in_dim
        if mlp_spec is not None:
            hidden, out, use_ln, mode = mlp_spec
            self.mlp = _PygMLP(d, hidden, out, use_ln, mode)
            d = out
        else:
            self.mlp = None
        self._stack = _PygGCNStack(d, gcn_hidden, gcn_out)

    def forward(self, x, edge_index):
        if self.mlp is not None:
            x = self.mlp(x)
        return self._stack(x, edge_index)


class WeatherPredictionPyg(nn.Module):
    """Flagship encode-process-decode built from REAL PyG layers with the
    executor's module tree (state_dict-compatible)."""

    def __init__(self, n_grid, n_mesh, obs, n_feat, hidden, mp_steps,
                 enc_edges, proc_edges, dec_edges, grid_static, mesh_static,
                 proc_edge_attr):
        super().__init__()
        self.n_grid, self.n_mesh = n_grid, n_mesh
        self.obs, self.n_feat = obs, n_feat
        enc_in = obs * n_feat + 6
        self.encoder = _PygEncDec(
            enc_in, ([2 * hidden], hidden, True, "node"), [hidden], hidden
        )
        self.processor_net = _PygInteractionProcessor(
            hidden, 4, hidden, mp_steps
        )
        self.decoder = _PygEncDec(
            hidden, ([2 * hidden], hidden, False, None), [hidden], n_feat
        )
        self.register_buffer("enc_edges", enc_edges)
        self.register_buffer("proc_edges", proc_edges)
        self.register_buffer("dec_edges", dec_edges)
        self.register_buffer("grid_static", grid_static)
        self.register_buffer("mesh_static", mesh_static)
        self.register_buffer("proc_edge_attr", proc_edge_attr)

    def forward(self, x_grid):
        grid_in = torch.cat([x_grid, self.grid_static], dim=-1)
        mesh_dyn = torch.zeros(self.n_mesh, x_grid.shape[-1])
        mesh_in = torch.cat([mesh_dyn, self.mesh_static], dim=-1)
        x = torch.cat([grid_in, mesh_in], dim=0)
        x = self.encoder(x, self.enc_edges)
        grid_latent, mesh_latent = x[: self.n_grid], x[self.n_grid:]
        mesh_processed = self.processor_net(
            mesh_latent, self.proc_edges, self.proc_edge_attr
        )
        out = self.decoder(
            torch.cat([grid_latent, mesh_processed], dim=0), self.dec_edges
        )
        return out[: self.n_grid]

    def rollout(self, window, steps):
        outs = []
        for _ in range(steps):
            inp = window.reshape(self.n_grid, self.obs * self.n_feat)
            out = window[:, -1, :] + self.forward(inp)
            outs.append(out)
            window = torch.cat([window[:, 1:, :], out[:, None, :]], dim=1)
        return torch.stack(outs, dim=1)


# ------------------------------------------------------------------ setup
def _build_pair():
    from graphcast_lite_tpu import presets
    from graphcast_lite_tpu.graphs.build import build_graph_set

    torch.manual_seed(0)
    cfg = presets.interaction_net_64x32(
        n_feat=N_FEAT, obs=OBS, pred=AR, hidden=HIDDEN, mp_steps=MP
    )
    lat, lon = presets.wb2_64x32_grid()
    gs = build_graph_set(lat, lon, cfg.graph.mesh_levels,
                         cfg.graph.grid2mesh_radius_query)

    def unpad(graph):
        e = graph.num_edges
        return (np.asarray(graph.senders)[:e].astype(np.int64),
                np.asarray(graph.receivers)[:e].astype(np.int64))

    es, er = unpad(gs.encoding)
    ps, pr = unpad(gs.processing)
    ds, dr = unpad(gs.decoding)
    p_attr = np.asarray(gs.processing.edge_attr)[: gs.processing.num_edges]
    kw = dict(
        n_grid=gs.num_grid_nodes, n_mesh=gs.num_mesh_nodes, obs=OBS,
        n_feat=N_FEAT, hidden=HIDDEN, mp_steps=MP,
        enc_edges=torch.tensor(np.stack([es, er])),
        proc_edges=torch.tensor(np.stack([ps, pr])),
        dec_edges=torch.tensor(np.stack([ds, dr])),
        grid_static=torch.tensor(gs.grid_static),
        mesh_static=torch.tensor(gs.mesh_static),
        proc_edge_attr=torch.tensor(p_attr),
    )
    pyg = WeatherPredictionPyg(**kw)
    ref = WeatherPredictionRef(**kw)
    # One set of weights for both (PyG's inits differ; PyG is the source).
    missing, unexpected = ref.load_state_dict(pyg.state_dict(), strict=False)
    assert not [k for k in missing if "edges" not in k], missing
    pyg.eval(), ref.eval()
    window = np.random.RandomState(0).randn(
        gs.num_grid_nodes, OBS, N_FEAT
    ).astype(np.float32)
    return cfg, gs, pyg, ref, window


def test_torch_reference_matches_real_pyg():
    _, _, pyg, ref, window = _build_pair()
    with torch.no_grad():
        out_pyg = pyg.rollout(torch.tensor(window), AR).numpy()
        out_ref = ref.rollout(torch.tensor(window), AR).numpy()
    np.testing.assert_allclose(out_ref, out_pyg, atol=2e-4, rtol=2e-4)


def test_jax_matches_real_pyg():
    import jax
    import jax.numpy as jnp

    from graphcast_lite_tpu.models.weather import ModelGraphs, WeatherModel
    from graphcast_lite_tpu.training.rollout import (
        RolloutSpec,
        rollout_predict,
    )
    from graphcast_lite_tpu.utils.torch_convert import (
        convert_reference_checkpoint,
    )

    cfg, gs, pyg, _, window = _build_pair()
    with torch.no_grad():
        out_pyg = pyg.rollout(torch.tensor(window), AR).numpy()

    sd = reference_state_dict_keys_remap(pyg)
    graphs = ModelGraphs.from_graph_set(gs)
    model = WeatherModel(pipeline=cfg.pipeline, data=cfg.data,
                         num_grid_nodes=gs.num_grid_nodes,
                         num_mesh_nodes=gs.num_mesh_nodes)
    x0 = jnp.zeros((gs.num_grid_nodes, OBS * N_FEAT), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, graphs)
    params = convert_reference_checkpoint(sd, params, cfg.pipeline)

    spec = RolloutSpec(obs_window=OBS, num_features=N_FEAT,
                       use_residual=True, remat=False)

    def model_fn(inp, m, t, p):
        out, _ = model.apply(params, inp[0], graphs, m, t, p)
        return out[None], None

    preds = rollout_predict(
        model_fn, jnp.asarray(window)[None], AR, spec
    )[0]
    np.testing.assert_allclose(
        np.asarray(preds), out_pyg, atol=5e-4, rtol=5e-4
    )
