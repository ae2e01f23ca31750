"""Pure-torch (PyG-free) executor of the reference's layer math.

Reimplements exactly the computations of reference ``src/models.py`` for the
layer types the acceptance criterion exercises — MLP (:54-109), GCNConv
(PyG gcn_norm semantics: symmetric normalization with implicit self loops),
InteractionNetLayer/Processor (:166-285), GraphLayer's ConvGCN stack
(:289-440) and WeatherPrediction's encode-process-decode forward (:476-927)
— using only torch.nn + index_add, and with module names chosen so
``state_dict()`` has EXACTLY the reference's key layout (encoder.mlp.MLP.i,
encoder.layers.i.lin.weight, processor.layers.steps.i.edge_mlp.0, ...).

That makes it the executable oracle for ``utils.torch_convert``: initialize
this model (torch default inits), convert its state dict with
``convert_reference_checkpoint``, and the JAX model must produce allclose
prognostic fields after 4 AR steps (tests/test_torch_parity.py) — the
BASELINE.json acceptance check, previously argued only via NumPy oracles.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


def gcn_forward(lin, bias, x, edge_index, num_nodes):
    """PyG GCNConv(add_self_loops=True, normalize=True) math.

    x: [N, C]; edge_index: [2, E] (sender, receiver).
    """
    xw = lin(x)
    snd, rcv = edge_index[0], edge_index[1]
    deg = torch.zeros(num_nodes, dtype=x.dtype)
    deg.index_add_(0, rcv, torch.ones(rcv.shape[0], dtype=x.dtype))
    deg = deg + 1.0
    dinv = deg.rsqrt()
    norm = dinv[snd] * dinv[rcv]
    out = torch.zeros_like(xw)
    out.index_add_(0, rcv, xw[snd] * norm[:, None])
    out = out + xw * (dinv * dinv)[:, None]
    return out + bias


class GCNConvRef(nn.Module):
    """Parameter container named like PyG GCNConv (lin.weight, bias)."""

    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.lin = nn.Linear(in_dim, out_dim, bias=False)
        self.bias = nn.Parameter(torch.zeros(out_dim))
        # PyG glorot init for lin
        bound = (6.0 / (in_dim + out_dim)) ** 0.5
        nn.init.uniform_(self.lin.weight, -bound, bound)

    def forward(self, x, edge_index):
        return gcn_forward(self.lin, self.bias, x, edge_index, x.shape[0])


class MLPRef(nn.Module):
    """Reference MLP (src/models.py:54-109): ModuleList named MLP with
    Linear, PReLU per hidden layer, final Linear, optional LayerNorm."""

    def __init__(self, in_dim, hidden_dims, out_dim, use_layer_norm,
                 norm_mode="node"):
        super().__init__()
        mods = []
        d = in_dim
        for h in hidden_dims:
            mods += [nn.Linear(d, h), nn.PReLU()]
            d = h
        mods.append(nn.Linear(d, out_dim))
        self.norm_mode = norm_mode if use_layer_norm else None
        if use_layer_norm:
            mods.append(nn.LayerNorm(out_dim))  # params only; see forward
        self.MLP = nn.ModuleList(mods)

    def forward(self, x):
        n = len(self.MLP) - (1 if self.norm_mode else 0)
        for i in range(n):
            x = self.MLP[i](x)
        if self.norm_mode:
            ln = self.MLP[-1]
            if self.norm_mode == "node":
                x = F.layer_norm(x, (x.shape[-1],), ln.weight, ln.bias)
            else:  # graph: one scalar mean/var over the whole tensor
                mu, var = x.mean(), x.var(unbiased=False)
                x = (x - mu) / torch.sqrt(var + 1e-5) * ln.weight + ln.bias
        return x


class GCNStackRef(nn.Module):
    """GraphLayer ConvGCN branch (src/models.py:309-340): convs interleaved
    with ONE shared PReLU, modules under ``layers`` at even positions."""

    def __init__(self, in_dim, hidden_dims, out_dim):
        super().__init__()
        dims = list(hidden_dims) + [out_dim]
        mods = []
        shared_act = nn.PReLU()
        d = in_dim
        for i, h in enumerate(dims):
            mods.append(GCNConvRef(d, h))
            if i < len(dims) - 1:
                mods.append(shared_act)  # same module object re-appended
            d = h
        self.layers = nn.ModuleList(mods)

    def forward(self, x, edge_index):
        for m in self.layers:
            x = m(x, edge_index) if isinstance(m, GCNConvRef) else m(x)
        return x


def _graph_ln(e, ln):
    mu, var = e.mean(), e.var(unbiased=False)
    return (e - mu) / torch.sqrt(var + 1e-5) * ln.weight + ln.bias


class InteractionStepRef(nn.Module):
    """InteractionNetLayer (src/models.py:166-236): edge MLP on
    [h_s ‖ h_r ‖ e], scatter-mean, node MLP on [h ‖ agg], residuals,
    LayerNorm(edge graph-mode, node node-mode)."""

    def __init__(self, d, de, hidden):
        super().__init__()
        self.edge_mlp = nn.Sequential(
            nn.Linear(2 * d + de, hidden), nn.SiLU(), nn.Linear(hidden, de)
        )
        self.node_mlp = nn.Sequential(
            nn.Linear(d + de, hidden), nn.SiLU(), nn.Linear(hidden, d)
        )
        self.edge_norm = nn.LayerNorm(de)
        self.node_norm = nn.LayerNorm(d)

    def forward(self, x, e, edge_index):
        snd, rcv = edge_index[0], edge_index[1]
        h = torch.cat([x[snd], x[rcv], e], dim=-1)
        e_upd = self.edge_mlp(h)
        agg = torch.zeros(x.shape[0], e.shape[-1], dtype=x.dtype)
        agg.index_add_(0, rcv, e_upd)
        deg = torch.zeros(x.shape[0], dtype=x.dtype)
        deg.index_add_(0, rcv, torch.ones(rcv.shape[0], dtype=x.dtype))
        agg = agg / deg.clamp(min=1.0)[:, None]
        n_upd = self.node_mlp(torch.cat([x, agg], dim=-1))
        new_e = _graph_ln(e + e_upd, self.edge_norm)
        new_x = F.layer_norm(x + n_upd, (x.shape[-1],),
                             self.node_norm.weight, self.node_norm.bias)
        return new_x, new_e


class InteractionProcessorRef(nn.Module):
    """InteractionNetProcessor (src/models.py:239-285): raw-edge encoder +
    N unshared steps.  Named ``layers`` so GraphLayer's prefix matches."""

    def __init__(self, d, raw_edge_dim, hidden, num_steps):
        super().__init__()
        self.edge_encoder = nn.Sequential(
            nn.Linear(raw_edge_dim, d), nn.SiLU()
        )
        self.steps = nn.ModuleList(
            [InteractionStepRef(d, d, hidden) for _ in range(num_steps)]
        )

    def forward(self, x, edge_index, edge_attr):
        e = self.edge_encoder(edge_attr)
        for step in self.steps:
            x, e = step(x, e, edge_index)
        return x


class EncDecBlockRef(nn.Module):
    """Model = (MLP) -> GraphLayer (src/models.py:443-473)."""

    def __init__(self, in_dim, mlp_spec, gcn_hidden, gcn_out):
        super().__init__()
        d = in_dim
        if mlp_spec is not None:
            hidden, out, use_ln, mode = mlp_spec
            self.mlp = MLPRef(d, hidden, out, use_ln, mode)
            d = out
        else:
            self.mlp = None
        self._stack = GCNStackRef(d, gcn_hidden, gcn_out)

    # expose the stack under the name "layers"-compatible prefix: the
    # converter reads "{prefix}.layers.{i}" — GCNStackRef stores ModuleList
    # as .layers, so register it as a direct attribute path.
    def forward(self, x, edge_index):
        if self.mlp is not None:
            x = self.mlp(x)
        return self._stack(x, edge_index)


class WeatherPredictionRef(nn.Module):
    """Reference WeatherPrediction forward (src/models.py:776-874) for the
    flagship configuration: GCN encoder/decoder, InteractionNet processor."""

    def __init__(self, n_grid, n_mesh, obs, n_feat, hidden, mp_steps,
                 enc_edges, proc_edges, dec_edges, grid_static, mesh_static,
                 proc_edge_attr):
        super().__init__()
        self.n_grid, self.n_mesh = n_grid, n_mesh
        self.obs, self.n_feat = obs, n_feat
        enc_in = obs * n_feat + 6

        self.encoder = EncDecBlockRef(
            enc_in, ([2 * hidden], hidden, True, "node"), [hidden], hidden
        )
        self.processor_net = InteractionProcessorRef(
            hidden, 4, hidden, mp_steps
        )
        self.decoder = EncDecBlockRef(
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
        combined = torch.cat([grid_latent, mesh_processed], dim=0)
        out = self.decoder(combined, self.dec_edges)
        return out[: self.n_grid]

    def rollout(self, window, steps):
        """AR rollout with residual prediction (reference train_epoch /
        predict.py:528-565; 33f setup: no static/forcing channels)."""
        outs = []
        for _ in range(steps):
            inp = window.reshape(self.n_grid, self.obs * self.n_feat)
            delta = self.forward(inp)
            out = window[:, -1, :] + delta
            outs.append(out)
            window = torch.cat([window[:, 1:, :], out[:, None, :]], dim=1)
        return torch.stack(outs, dim=1)


def reference_state_dict_keys_remap(model: WeatherPredictionRef):
    """state_dict with the reference's exact key prefixes.

    The converter expects ``encoder.layers.{i}...`` (GraphLayer stores its
    stack as `layers`) and ``processor.layers.steps.{i}...`` /
    ``processor.layers.edge_encoder.0...`` (Model -> GraphLayer -> layers =
    the InteractionNetProcessor).  Buffers are dropped (graphs are rebuilt).
    """
    sd = model.state_dict()
    out = {}
    for k, v in sd.items():
        if not k.endswith(("weight", "bias")) or "edges" in k:
            continue
        k = k.replace("encoder._stack.layers", "encoder.layers")
        k = k.replace("decoder._stack.layers", "decoder.layers")
        k = k.replace("processor_net.", "processor.layers.")
        out[k] = v.detach().numpy()
    return out
