"""Parity of ops.gcn_agg (custom-VJP GCN aggregation) against jax.grad of
the plain gather/segment expression, in both backward modes."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphcast_lite_tpu.graphs.structure import build_graph
from graphcast_lite_tpu.ops.gcn_agg import gcn_aggregate


def _random_graph(rng, n_nodes=40, e=300, high_out_degree=False):
    if high_out_degree:
        # few senders with many outgoing edges -> no transpose ELL
        senders = rng.randint(0, 3, size=e)
    else:
        senders = rng.randint(0, n_nodes, size=e)
    receivers = rng.randint(0, n_nodes, size=e)
    return build_graph(senders, receivers, num_nodes=n_nodes)


@pytest.mark.parametrize("high_out_degree", [False, True])
def test_gcn_aggregate_matches_autodiff(high_out_degree):
    rng = np.random.RandomState(0)
    g = _random_graph(rng, high_out_degree=high_out_degree)
    if high_out_degree:
        assert g.t_neigh_edge is None  # forces the pallas backward mode
    else:
        assert g.t_neigh_edge is not None
    n, f = g.num_nodes, 128
    x = jnp.asarray(rng.randn(n, f).astype(np.float32))
    scale = jnp.asarray(
        (rng.rand(g.padded_num_edges) * np.asarray(g.edge_mask)).astype(
            np.float32
        )
    )

    def ref(x):
        msgs = jnp.take(x, g.senders, axis=0) * scale[:, None]
        return jax.ops.segment_sum(
            msgs, g.receivers, num_segments=g.num_receivers,
            indices_are_sorted=True,
        )

    def fused(x):
        return gcn_aggregate(x, scale, g)

    out_ref = ref(x)
    out_fused = fused(x)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)

    cot = jnp.asarray(rng.randn(*out_ref.shape).astype(np.float32))
    g_ref = jax.grad(lambda x: (ref(x) * cot).sum())(x)
    g_fused = jax.grad(lambda x: (fused(x) * cot).sum())(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=2e-5, atol=2e-5)


def test_gcn_conv_uses_fused_path_numerics():
    """GCNConv output/grad parity when the fused path is force-enabled
    (GCLT_PALLAS_SEGMENT=1 -> interpret-mode kernel on CPU)."""
    import os

    from graphcast_lite_tpu.models.gnn import GCNConv

    rng = np.random.RandomState(1)
    # >=16384 edges to pass the policy threshold; small node count keeps it
    # cheap in interpret mode
    g = build_graph(rng.randint(0, 64, size=16400),
                    rng.randint(0, 64, size=16400), num_nodes=64)
    x = jnp.asarray(rng.randn(64, 128).astype(np.float32))
    conv = GCNConv(128)
    params = conv.init(jax.random.PRNGKey(0), x, g)

    out_ref = conv.apply(params, x, g)
    grad_ref = jax.grad(
        lambda p: (conv.apply(p, x, g) ** 2).sum()
    )(params)

    from graphcast_lite_tpu.ops.fused_edge import training_trace

    os.environ["GCLT_PALLAS_SEGMENT"] = "1"
    os.environ["GCLT_GCN_AGG"] = "1"   # opt-in (off by default, see policy)
    try:
        with training_trace():  # the fused path is training-trace-gated
            out_fused = conv.apply(params, x, g)
            grad_fused = jax.grad(
                lambda p: (conv.apply(p, x, g) ** 2).sum()
            )(params)
    finally:
        del os.environ["GCLT_PALLAS_SEGMENT"]
        del os.environ["GCLT_GCN_AGG"]

    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(grad_fused), jax.tree.leaves(grad_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)
