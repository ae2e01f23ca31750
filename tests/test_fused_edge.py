"""Parity tests for the fused edge pipeline (ops/fused_edge.py).

The fused unit must match (a) the unfused forward math exactly and (b)
``jax.grad`` of that math through every differentiable input — the backward
is hand-written, so autodiff of a plain-jnp reference is the oracle.
Runs in Pallas interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from graphcast_lite_tpu.graphs.structure import build_graph
from graphcast_lite_tpu.ops.fused_edge import edge_pipeline


def make_graph(rng, n=300, e=2000):
    s = rng.randint(0, n, e)
    r = rng.randint(0, n, e)
    return build_graph(s, r, num_nodes=n, pad_multiple=128)


def reference_pipeline(x, e_attr, mask, w1s, w1r, w1e, b1, w2, b2, graph):
    """Plain-jnp math the fused unit must reproduce (act = silu)."""
    h_pre = (
        jnp.take(x @ w1s, graph.senders, axis=0)
        + jnp.take(x @ w1r, graph.receivers, axis=0)
        + e_attr @ w1e
        + b1
    )
    eu = nn.silu(h_pre) @ w2 + b2
    agg_sum = jax.ops.segment_sum(
        eu * mask[:, None], graph.receivers,
        num_segments=graph.num_receivers, indices_are_sorted=True,
    )
    deg = jax.ops.segment_sum(
        mask, graph.receivers, num_segments=graph.num_receivers,
        indices_are_sorted=True,
    )
    return eu, agg_sum / jnp.maximum(deg, 1.0)[:, None]


@pytest.mark.parametrize("d,de,h", [(128, 128, 128), (128, 256, 128)])
def test_forward_and_grad_parity(rng, d, de, h):
    g = make_graph(rng)
    n, e_pad = g.num_nodes, g.padded_num_edges
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    e_attr = jnp.asarray(rng.randn(e_pad, de).astype(np.float32))
    w1s = jnp.asarray(rng.randn(d, h).astype(np.float32) * 0.1)
    w1r = jnp.asarray(rng.randn(d, h).astype(np.float32) * 0.1)
    w1e = jnp.asarray(rng.randn(de, h).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(h).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(h, de).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(de).astype(np.float32) * 0.1)
    # Random projections so the scalar loss exercises every REAL output
    # element.  Padded edge rows are excluded: their values/cotangents are
    # unspecified by contract (every real consumer masks them; the clipped
    # kernel schedules repoint their ids into the live band, so their
    # garbage differs from the oracle's garbage).
    n_real = g.num_edges
    pad_keep = np.zeros((e_pad, 1), np.float32)
    pad_keep[:n_real] = 1.0
    p_eu = jnp.asarray(rng.randn(e_pad, de).astype(np.float32) * pad_keep)
    p_agg = jnp.asarray(rng.randn(g.num_receivers, de).astype(np.float32))

    def loss(fn, *args):
        eu, agg = fn(*args)
        return jnp.sum(eu * p_eu) + jnp.sum(agg * p_agg)

    args = (x, e_attr, g.edge_mask, w1s, w1r, w1e, b1, w2, b2)

    out_f = edge_pipeline(*args, g, activation="swish")
    out_r = reference_pipeline(*args, g)
    np.testing.assert_allclose(np.asarray(out_f[0])[:n_real],
                               np.asarray(out_r[0])[:n_real],
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(out_f[1]), np.asarray(out_r[1]),
                               atol=2e-4, rtol=2e-4)

    grad_f = jax.grad(
        lambda *a: loss(lambda *aa: edge_pipeline(*aa, g, activation="swish"),
                        *a),
        argnums=tuple(range(9)),
    )(*args)
    grad_r = jax.grad(
        lambda *a: loss(lambda *aa: reference_pipeline(*aa, g), *a),
        argnums=tuple(range(9)),
    )(*args)
    names = ["x", "e_attr", "mask", "w1s", "w1r", "w1e", "b1", "w2", "b2"]
    for name, gf, gr in zip(names, grad_f, grad_r):
        if name == "mask":
            continue  # fused unit returns zero grad for the mask by design
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=3e-3, rtol=3e-3,
            err_msg=f"grad mismatch for {name}",
        )


def test_layer_param_compat_and_forward(rng, monkeypatch):
    """_FusedEdgeMLP and _SplitEdgeMLP must share parameter trees (names,
    shapes, AND init draws), and InteractionNetLayer must produce the same
    outputs whichever path the gate picks."""
    from graphcast_lite_tpu.models import gnn

    g = make_graph(rng)
    n, e_pad = g.num_nodes, g.padded_num_edges
    d = de = hd = 128
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    e_attr = jnp.asarray(rng.randn(e_pad, de).astype(np.float32))

    layer = gnn.InteractionNetLayer(node_dim=d, edge_dim=de, hidden_dim=hd,
                                    activation="swish")

    monkeypatch.setattr(gnn, "_use_fused_edge_path", lambda *a, **k: False)
    params_split = layer.init(jax.random.PRNGKey(7), x, e_attr, g)
    out_split = layer.apply(params_split, x, e_attr, g)

    monkeypatch.setattr(gnn, "_use_fused_edge_path", lambda *a, **k: True)
    monkeypatch.setenv("GCLT_PALLAS_SEGMENT", "1")
    params_fused = layer.init(jax.random.PRNGKey(7), x, e_attr, g)

    flat_s = jax.tree_util.tree_flatten_with_path(params_split)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(params_fused)[0]
    assert [k for k, _ in flat_s] == [k for k, _ in flat_f]
    for (ks, vs), (_, vf) in zip(flat_s, flat_f):
        np.testing.assert_array_equal(np.asarray(vs), np.asarray(vf),
                                      err_msg=str(ks))

    out_fused = layer.apply(params_split, x, e_attr, g)
    n_real = g.num_edges
    # node outputs fully; edge outputs on REAL rows (padded rows are
    # unspecified by contract — masked everywhere downstream)
    np.testing.assert_allclose(np.asarray(out_fused[0]),
                               np.asarray(out_split[0]),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(out_fused[1])[:n_real],
                               np.asarray(out_split[1])[:n_real],
                               atol=2e-4, rtol=2e-4)


def test_training_trace_gates_fused_path(monkeypatch):
    """use_fused_edge() must be False outside and True inside
    training_trace() (with the env overrides cleared / kernel policy on),
    and rollout_loss must set the flag during its trace (ADVICE r1)."""
    from graphcast_lite_tpu.ops import fused_edge, segment

    monkeypatch.delenv("GCLT_FUSED_EDGE", raising=False)
    monkeypatch.setattr(segment, "use_pallas_segment_sum", lambda: True)

    assert not fused_edge.use_fused_edge()
    with fused_edge.training_trace():
        assert fused_edge.use_fused_edge()
    assert not fused_edge.use_fused_edge()

    # env override wins in both directions
    monkeypatch.setenv("GCLT_FUSED_EDGE", "1")
    assert fused_edge.use_fused_edge()
    monkeypatch.setenv("GCLT_FUSED_EDGE", "0")
    with fused_edge.training_trace():
        assert not fused_edge.use_fused_edge()
    monkeypatch.delenv("GCLT_FUSED_EDGE")

    # rollout_loss sets the flag for the duration of its (model_fn) trace.
    from graphcast_lite_tpu.training.rollout import RolloutSpec, rollout_loss

    seen = []

    def model_fn(inp, m, t, p):
        seen.append(fused_edge.use_fused_edge())
        return jnp.zeros_like(inp[..., :4]), m

    spec = RolloutSpec(obs_window=1, num_features=4, use_residual=False,
                       remat=False)
    window = jnp.zeros((2, 5, 1, 4))
    targets = jnp.zeros((2, 5, 1, 4))
    rollout_loss(model_fn, window, targets, 1, spec)
    assert seen == [True]
    assert not fused_edge.use_fused_edge()


def test_hybrid_bwd_mode_grad_parity(rng, monkeypatch):
    """GCLT_FUSED_BWD=hybrid (d_xr via the sorted kernel, d_xs via the
    transpose-ELL gather) must match autodiff of the reference math."""
    monkeypatch.setenv("GCLT_FUSED_BWD", "hybrid")
    g = make_graph(rng)
    n, e_pad = g.num_nodes, g.padded_num_edges
    d = de = h = 128
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    e_attr = jnp.asarray(rng.randn(e_pad, de).astype(np.float32))
    w1s = jnp.asarray(rng.randn(d, h).astype(np.float32) * 0.1)
    w1r = jnp.asarray(rng.randn(d, h).astype(np.float32) * 0.1)
    w1e = jnp.asarray(rng.randn(de, h).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(h).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(h, de).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(de).astype(np.float32) * 0.1)
    n_real = g.num_edges
    keep = np.zeros((e_pad, 1), np.float32)
    keep[:n_real] = 1.0
    p_eu = jnp.asarray(rng.randn(e_pad, de).astype(np.float32) * keep)
    p_agg = jnp.asarray(rng.randn(g.num_receivers, de).astype(np.float32))

    def loss(fn, *args):
        eu, agg = fn(*args)
        return jnp.sum(eu * p_eu) + jnp.sum(agg * p_agg)

    args = (x, e_attr, g.edge_mask, w1s, w1r, w1e, b1, w2, b2)
    grad_f = jax.grad(
        lambda *a: loss(lambda *aa: edge_pipeline(*aa, g, activation="swish"),
                        *a),
        argnums=(0, 1, 3, 4, 5, 7),
    )(*args)
    grad_r = jax.grad(
        lambda *a: loss(lambda *aa: reference_pipeline(*aa, g), *a),
        argnums=(0, 1, 3, 4, 5, 7),
    )(*args)
    for gf, gr in zip(grad_f, grad_r):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=3e-3, rtol=3e-3)
