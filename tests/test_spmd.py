"""SPMD parity: the explicitly sharded processor must reproduce the
single-device InteractionNetProcessor bit-for-bit-ish on an 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphcast_lite_tpu.graphs.partition import (
    gather_nodes,
    partition_nodes_by_latitude,
    scatter_nodes,
    shard_graph,
)
from graphcast_lite_tpu.models.gnn import InteractionNetProcessor
from graphcast_lite_tpu.parallel.spmd import (
    make_space_mesh,
    sharded_interaction_processor,
)


def test_partition_round_trip(rng, small_graph_set):
    gs = small_graph_set
    shard_of = partition_nodes_by_latitude(gs.mesh_lat, 8)
    assert shard_of.max() == 7
    sg = shard_graph(gs.processing, shard_of, 8)
    x = rng.randn(gs.num_mesh_nodes, 5).astype(np.float32)
    x_sharded = scatter_nodes(sg, x)
    back = gather_nodes(sg, x_sharded)
    np.testing.assert_array_equal(back, x)
    # Every real edge lands on exactly one shard.
    assert int(sg.edge_mask.sum()) == gs.processing.num_edges
    # Receivers are locally owned.
    for s in range(8):
        live = sg.edge_mask[s] > 0
        owners = sg.inv_slots[s][sg.receivers_local[s][live]]
        assert (shard_of[owners] == s).all()


@pytest.mark.parametrize("use_ln", [True, False])
def test_sharded_processor_parity(rng, small_graph_set, use_ln):
    gs = small_graph_set
    d = 16
    module = InteractionNetProcessor(
        node_dim=d, raw_edge_dim=4, edge_latent_dim=d, hidden_dim=d,
        num_steps=3, activation="swish", use_layer_norm=use_ln,
    )
    x = jnp.asarray(rng.randn(gs.num_mesh_nodes, d).astype(np.float32))
    params = module.init(jax.random.PRNGKey(0), x, gs.processing)
    expect = np.asarray(module.apply(params, x, gs.processing))

    mesh = make_space_mesh(8)
    shard_of = partition_nodes_by_latitude(gs.mesh_lat, 8)
    sg = shard_graph(gs.processing, shard_of, 8)
    x_sh = jnp.asarray(scatter_nodes(sg, np.asarray(x)))
    out_sh = sharded_interaction_processor(
        params, x_sh, sg, mesh, use_layer_norm=use_ln
    )
    got = gather_nodes(sg, np.asarray(out_sh))
    np.testing.assert_allclose(got, expect, atol=2e-4, rtol=2e-4)
