"""Parity tests: GNN layers vs explicit NumPy oracles of PyG semantics.

The oracles below are independent loop/dense implementations of
GCNConv / GATConv / SimpleConv / InteractionNet exactly as PyG computes them
(self-loop handling, normalization, softmax, head averaging), serving as the
correctness anchor the reference repo never had (it had no tests at all).
COO and ELL layouts are both exercised.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphcast_lite_tpu.graphs.structure import build_graph
from graphcast_lite_tpu.models.gnn import (
    GATConv,
    GCNConv,
    InteractionNetLayer,
    SimpleConv,
    SparseGATConv,
)
from graphcast_lite_tpu.models.nn import PyGLayerNorm


def random_graph(rng, n_nodes=23, n_edges=80, build_ell=True):
    s = rng.randint(0, n_nodes, n_edges)
    r = rng.randint(0, n_nodes, n_edges)
    return build_graph(s, r, num_nodes=n_nodes, build_ell=build_ell,
                       pad_multiple=16), s, r


# ----------------------------------------------------------------- oracles --
def gcn_oracle(x, w, b, senders, receivers, n):
    """PyG GCNConv: add self loops, symmetric deg^-1/2 normalization."""
    xw = x @ w
    s = np.concatenate([senders, np.arange(n)])
    r = np.concatenate([receivers, np.arange(n)])
    deg = np.bincount(r, minlength=n).astype(np.float64)
    dinv = 1.0 / np.sqrt(deg)
    out = np.zeros((n, w.shape[1]))
    for e in range(len(s)):
        out[r[e]] += dinv[s[e]] * dinv[r[e]] * xw[s[e]]
    return out + b


def gat_oracle(x, w, att_src, att_dst, bias, senders, receivers, n, heads, c):
    """PyG GATConv(concat=False): self loops, LeakyReLU(0.2) logits,
    per-receiver softmax, head mean, bias."""
    xp = (x @ w).reshape(n, heads, c)
    a_s = (xp * att_src).sum(-1)  # [N, H]
    a_d = (xp * att_dst).sum(-1)
    s = np.concatenate([senders, np.arange(n)])
    r = np.concatenate([receivers, np.arange(n)])
    logits = a_s[s] + a_d[r]
    logits = np.where(logits >= 0, logits, 0.2 * logits)
    out = np.zeros((n, heads, c))
    for node in range(n):
        idx = np.flatnonzero(r == node)
        if len(idx) == 0:
            continue
        lg = logits[idx]  # [k, H]
        alpha = np.exp(lg - lg.max(axis=0))
        alpha = alpha / alpha.sum(axis=0)
        for j, e in enumerate(idx):
            out[node] += alpha[j][:, None] * xp[s[e]]
    return out.mean(axis=1) + bias


def simple_conv_oracle(x, senders, receivers, n):
    out = np.zeros((n, x.shape[1]))
    cnt = np.bincount(receivers, minlength=n)
    for e in range(len(senders)):
        out[receivers[e]] += x[senders[e]]
    return out / np.maximum(cnt, 1)[:, None]


# ------------------------------------------------------------------- tests --
@pytest.mark.parametrize("build_ell", [False, True])
def test_gcn_parity(rng, build_ell):
    graph, s, r = random_graph(rng, build_ell=build_ell)
    x = rng.randn(23, 7).astype(np.float32)
    layer = GCNConv(5)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), graph)
    out = layer.apply(params, jnp.asarray(x), graph)
    w = np.asarray(params["params"]["kernel"])
    b = np.asarray(params["params"]["bias"])
    expect = gcn_oracle(x.astype(np.float64), w.astype(np.float64), b, s, r, 23)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("build_ell", [False, True])
@pytest.mark.parametrize("heads", [1, 4])
def test_gat_parity(rng, build_ell, heads):
    graph, s, r = random_graph(rng, build_ell=build_ell)
    x = rng.randn(23, 6).astype(np.float32)
    layer = GATConv(5, heads=heads)
    params = layer.init(jax.random.PRNGKey(1), jnp.asarray(x), graph)
    out = layer.apply(params, jnp.asarray(x), graph)
    core = params["params"]["core"]
    expect = gat_oracle(
        x.astype(np.float64),
        np.asarray(core["kernel"], np.float64),
        np.asarray(core["att_src"], np.float64),
        np.asarray(core["att_dst"], np.float64),
        np.asarray(core["bias"], np.float64),
        s, r, 23, heads, 5,
    )
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("build_ell", [False, True])
def test_simple_conv_parity(rng, build_ell):
    graph, s, r = random_graph(rng, build_ell=build_ell)
    x = rng.randn(23, 6).astype(np.float32)
    layer = SimpleConv()
    params = layer.init(jax.random.PRNGKey(2), jnp.asarray(x), graph)
    out = layer.apply(params, jnp.asarray(x), graph)
    expect = simple_conv_oracle(x.astype(np.float64), s, r, 23)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5, rtol=1e-5)


def test_sparse_gat_prune_mask(rng):
    graph, s, r = random_graph(rng)
    x = rng.randn(23, 6).astype(np.float32)
    layer = SparseGATConv(5, heads=1)
    params = layer.init(jax.random.PRNGKey(3), jnp.asarray(x), graph)
    out0, mask0 = layer.apply(
        params, jnp.asarray(x), graph, None, 0.0, False
    )
    # No pruning without prune=True.
    np.testing.assert_array_equal(np.asarray(mask0), np.asarray(graph.edge_mask))
    out1, mask1 = layer.apply(
        params, jnp.asarray(x), graph, None, 0.05, True
    )
    m1 = np.asarray(mask1)
    assert m1.sum() <= np.asarray(graph.edge_mask).sum()
    assert set(np.unique(m1)).issubset({0.0, 1.0})
    # Masked edges stay masked on a second prune (monotone sparsification).
    _, mask2 = layer.apply(params, jnp.asarray(x), graph, mask1, 0.0, True)
    assert (np.asarray(mask2) <= m1 + 1e-9).all()
    # Forward with pruned mask differs (edges actually removed).
    out2, _ = layer.apply(params, jnp.asarray(x), graph, mask1, 0.0, False)
    if m1.sum() < np.asarray(graph.edge_mask).sum():
        assert not np.allclose(np.asarray(out2), np.asarray(out0))


def test_interaction_net_layer(rng):
    graph, s, r = random_graph(rng, n_nodes=17, n_edges=60)
    x = rng.randn(17, 8).astype(np.float32)
    e = rng.randn(graph.padded_num_edges, 8).astype(np.float32)
    e[graph.num_edges:] = 0.0
    layer = InteractionNetLayer(node_dim=8, edge_dim=8, hidden_dim=16,
                                activation="swish", use_layer_norm=False)
    params = layer.init(jax.random.PRNGKey(4), jnp.asarray(x), jnp.asarray(e), graph)
    new_x, new_e = layer.apply(params, jnp.asarray(x), jnp.asarray(e), graph)

    # Oracle (residual, scatter-mean), no LN for exactness of the graph part.
    def mlp(p, v):
        h = v @ np.asarray(p["lin_0"]["kernel"]) + np.asarray(p["lin_0"]["bias"])
        h = h / (1 + np.exp(-h)) * 1.0  # silu = x*sigmoid(x)
        return h @ np.asarray(p["lin_1"]["kernel"]) + np.asarray(p["lin_1"]["bias"])

    def silu(v):
        return v / (1 + np.exp(-v))

    p = params["params"]
    srt = np.argsort(r, kind="stable")
    ss, rr = s[srt], r[srt]
    e_real = np.asarray(e)[: graph.num_edges]
    edge_in = np.concatenate([x[ss], x[rr], e_real], axis=1)
    h = silu(edge_in @ np.asarray(p["edge_mlp"]["lin_0"]["kernel"])
             + np.asarray(p["edge_mlp"]["lin_0"]["bias"]))
    e_upd = h @ np.asarray(p["edge_mlp"]["lin_1"]["kernel"]) + np.asarray(
        p["edge_mlp"]["lin_1"]["bias"])
    agg = np.zeros((17, 8))
    cnt = np.bincount(rr, minlength=17)
    for i in range(len(ss)):
        agg[rr[i]] += e_upd[i]
    agg = agg / np.maximum(cnt, 1)[:, None]
    node_in = np.concatenate([x, agg], axis=1)
    h2 = silu(node_in @ np.asarray(p["node_mlp"]["lin_0"]["kernel"])
              + np.asarray(p["node_mlp"]["lin_0"]["bias"]))
    n_upd = h2 @ np.asarray(p["node_mlp"]["lin_1"]["kernel"]) + np.asarray(
        p["node_mlp"]["lin_1"]["bias"])
    np.testing.assert_allclose(np.asarray(new_x), x + n_upd, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(new_e)[: graph.num_edges], e_real + e_upd, atol=1e-4
    )


def test_pyg_layernorm_modes(rng):
    x = rng.randn(11, 7).astype(np.float32)
    for mode in ["node", "graph"]:
        ln = PyGLayerNorm(mode=mode)
        params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out = np.asarray(ln.apply(params, jnp.asarray(x)))
        if mode == "node":
            expect = (x - x.mean(1, keepdims=True)) / np.sqrt(
                x.var(1, keepdims=True) + 1e-5
            )
        else:
            expect = (x - x.mean()) / np.sqrt(x.var() + 1e-5)
        np.testing.assert_allclose(out, expect, atol=1e-5)
    # Graph mode with a row mask ignores masked rows in the statistics.
    ln = PyGLayerNorm(mode="graph")
    params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    mask = np.ones(11, np.float32)
    mask[8:] = 0.0
    out = np.asarray(ln.apply(params, jnp.asarray(x), mask=jnp.asarray(mask)))
    xm = x[:8]
    expect8 = (x - xm.mean()) / np.sqrt(xm.var() + 1e-5)
    np.testing.assert_allclose(out[:8], expect8[:8], atol=1e-5)


def test_masked_edges_are_inert(rng):
    """A fully-masked duplicate edge must not change any layer's output."""
    n = 12
    s = rng.randint(0, n, 30)
    r = rng.randint(0, n, 30)
    g1 = build_graph(s, r, num_nodes=n, pad_multiple=8)
    # Same graph plus junk edges that we mask off.
    s2 = np.concatenate([s, rng.randint(0, n, 6)])
    r2 = np.concatenate([r, rng.randint(0, n, 6)])
    g2 = build_graph(s2, r2, num_nodes=n, pad_multiple=8)
    # Build the kill mask in g2's sorted coo order: mark the 6 junk edges.
    order = np.argsort(r2, kind="stable")
    kill = np.zeros(len(s2), np.float32)
    kill[30:] = 1.0
    kill_sorted = kill[order]
    mask2 = np.asarray(g2.edge_mask).copy()
    mask2[: len(s2)][kill_sorted.astype(bool)] = 0.0

    x = rng.randn(n, 5).astype(np.float32)
    for layer in [GCNConv(4), GATConv(4, heads=2), SimpleConv()]:
        params = layer.init(jax.random.PRNGKey(7), jnp.asarray(x), g1)
        o1 = layer.apply(params, jnp.asarray(x), g1)
        o2 = layer.apply(params, jnp.asarray(x), g2, jnp.asarray(mask2))
        np.testing.assert_allclose(
            np.asarray(o1), np.asarray(o2), atol=1e-5,
            err_msg=f"{type(layer).__name__} not mask-invariant",
        )


def test_params_only_linear_matches_torch_linear():
    """_TorchLinearParams (the single params-only declarator used by the
    split/fused edge MLPs) draws BIT-IDENTICAL params to TorchLinear under
    the same RNG — plain, split and fused paths share checkpoints."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from graphcast_lite_tpu.models.gnn import _TorchLinearParams
    from graphcast_lite_tpu.models.nn import TorchLinear

    key = jax.random.PRNGKey(11)
    x = jnp.zeros((4, 24))
    a = TorchLinear(16, name="lin_0").init(key, x)
    b = _TorchLinearParams(24, 16, name="lin_0").init(key, x)
    np.testing.assert_array_equal(
        np.asarray(a["params"]["kernel"]), np.asarray(b["params"]["kernel"])
    )
    np.testing.assert_array_equal(
        np.asarray(a["params"]["bias"]), np.asarray(b["params"]["bias"])
    )


def test_lazy_processor_parity(rng, small_graph_set):
    """The lazy-LN scan body (carry = (x, v, a, c), LN folded into the next
    step's edge projection) matches the standard InteractionNetProcessor
    bit-for-bit-ish, with an IDENTICAL parameter tree (checkpoints are
    interchangeable)."""
    import os

    from graphcast_lite_tpu.models.gnn import InteractionNetProcessor

    g = small_graph_set.processing
    d = 48
    proc = InteractionNetProcessor(
        node_dim=d, raw_edge_dim=4, edge_latent_dim=d, hidden_dim=d,
        num_steps=3, activation="swish", use_layer_norm=True,
    )
    x = jnp.asarray(rng.randn(g.num_nodes, d).astype(np.float32))

    os.environ["GCLT_LAZY_EDGE"] = "0"
    try:
        params_std = proc.init(jax.random.PRNGKey(7), x, g)
        out_std = proc.apply(params_std, x, g)
        os.environ["GCLT_LAZY_EDGE"] = "1"
        params_lazy = proc.init(jax.random.PRNGKey(7), x, g)
        out_lazy = proc.apply(params_lazy, x, g)
        # identical param trees (same paths, same init draws)
        flat_std = jax.tree_util.tree_leaves_with_path(params_std)
        flat_lazy = jax.tree_util.tree_leaves_with_path(params_lazy)
        assert [p for p, _ in flat_std] == [p for p, _ in flat_lazy]
        for (_, a), (_, b) in zip(flat_std, flat_lazy):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(
            np.asarray(out_lazy), np.asarray(out_std), atol=2e-5, rtol=2e-5
        )
        # cross-application: standard-trained params through the lazy path
        out_cross = proc.apply(params_std, x, g)
        np.testing.assert_allclose(
            np.asarray(out_cross), np.asarray(out_std), atol=2e-5, rtol=2e-5
        )
    finally:
        os.environ.pop("GCLT_LAZY_EDGE", None)


def test_lazy_processor_respects_edge_mask(rng, small_graph_set):
    """Pruned-edge masks flow through the lazy body's stats and aggregation
    identically to the standard path."""
    import os

    from graphcast_lite_tpu.models.gnn import InteractionNetProcessor

    g = small_graph_set.processing
    d = 32
    proc = InteractionNetProcessor(
        node_dim=d, raw_edge_dim=4, edge_latent_dim=d, hidden_dim=d,
        num_steps=2, activation="swish", use_layer_norm=True,
    )
    x = jnp.asarray(rng.randn(g.num_nodes, d).astype(np.float32))
    mask = np.asarray(g.edge_mask)
    live = np.flatnonzero(mask > 0)
    mask2 = mask.copy()
    mask2[live[::3]] = 0.0
    mask2 = jnp.asarray(mask2)

    os.environ["GCLT_LAZY_EDGE"] = "0"
    try:
        params = proc.init(jax.random.PRNGKey(3), x, g)
        out_std = proc.apply(params, x, g, edge_mask=mask2)
        os.environ["GCLT_LAZY_EDGE"] = "1"
        out_lazy = proc.apply(params, x, g, edge_mask=mask2)
        np.testing.assert_allclose(
            np.asarray(out_lazy), np.asarray(out_std), atol=2e-5, rtol=2e-5
        )
    finally:
        os.environ.pop("GCLT_LAZY_EDGE", None)


def test_lazy_processor_step_kernel_parity(rng):
    """The fused edge-step kernel path (GCLT_EDGE_STEP=1, interpret mode)
    matches the plain lazy path through a full processor run."""
    import os

    from graphcast_lite_tpu.graphs.structure import build_graph
    from graphcast_lite_tpu.models.gnn import InteractionNetProcessor

    n, e = 700, 20000
    s = rng.randint(0, n, e)
    r = rng.randint(0, n, e)
    os.environ["GCLT_EDGE_STEP"] = "1"   # schedule build is gated on opt-in
    g = build_graph(s, r, num_nodes=n, build_ell=False, pad_multiple=128)
    os.environ.pop("GCLT_EDGE_STEP", None)
    assert g.step_sched is not None
    d = 128
    proc = InteractionNetProcessor(
        node_dim=d, raw_edge_dim=4, edge_latent_dim=d, hidden_dim=d,
        num_steps=2, activation="swish", use_layer_norm=True,
    )
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    edge_raw = jnp.asarray(
        rng.randn(g.padded_num_edges, 4).astype(np.float32)
    )

    os.environ["GCLT_LAZY_EDGE"] = "1"
    os.environ["GCLT_EDGE_STEP"] = "0"
    try:
        params = proc.init(jax.random.PRNGKey(5), x, g, edge_raw)
        out_plain = proc.apply(params, x, g, edge_raw)
        os.environ["GCLT_EDGE_STEP"] = "1"
        out_step = proc.apply(params, x, g, edge_raw)
        np.testing.assert_allclose(
            np.asarray(out_step), np.asarray(out_plain), atol=2e-4,
            rtol=2e-4,
        )
    finally:
        os.environ.pop("GCLT_LAZY_EDGE", None)
        os.environ.pop("GCLT_EDGE_STEP", None)


def test_regular_block_processor_matches_coo(monkeypatch):
    """The constant-degree per-level block layout (graphs.structure
    .RegularBlocks, GCLT_REG_EDGE=1) must reproduce the COO processor
    exactly: same params, same outputs."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from graphcast_lite_tpu.graphs.build import build_graph_set
    from graphcast_lite_tpu.models.gnn import InteractionNetProcessor

    lat = np.linspace(-80, 80, 16).astype(np.float32)
    lon = np.arange(0, 360, 360 / 32).astype(np.float32)
    gs = build_graph_set(lat, lon, [1, 2], 0.6)
    pg = gs.processing
    assert pg.reg_blocks is not None
    # Level prefixes 42 / 162, degree 6, slot-major layout.
    assert pg.reg_blocks.block_recv == (42, 162)
    assert pg.reg_blocks.block_k == (6, 6)
    # Block masks cover exactly the real edges.
    assert int(np.asarray(pg.reg_blocks.mask).sum()) == pg.num_edges

    m, h = gs.num_mesh_nodes, 32
    proc = InteractionNetProcessor(
        node_dim=h, raw_edge_dim=4, edge_latent_dim=h, hidden_dim=h,
        num_steps=3, activation="swish", use_layer_norm=True)
    x = jnp.asarray(np.random.RandomState(0).randn(m, h).astype(np.float32))
    params = proc.init(jax.random.PRNGKey(0), x, pg)

    monkeypatch.setenv("GCLT_LAZY_EDGE", "1")
    monkeypatch.setenv("GCLT_REG_EDGE", "1")
    out_reg = np.asarray(proc.apply(params, x, pg))
    monkeypatch.setenv("GCLT_REG_EDGE", "0")
    out_coo = np.asarray(proc.apply(params, x, pg))
    np.testing.assert_allclose(out_reg, out_coo, atol=2e-5)

    # Pruned/regional meshes must NOT carry blocks (prefix ids break).
    gs_r = build_graph_set(
        np.linspace(40, 60, 8).astype(np.float32),
        np.linspace(60, 90, 12).astype(np.float32),
        [1, 2], 0.6, region_bounds=(40, 60, 60, 90),
    )
    assert gs_r.processing.reg_blocks is None
