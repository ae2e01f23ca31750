"""SPMD parity: the explicitly sharded processor must reproduce the
single-device InteractionNetProcessor bit-for-bit-ish on an 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphcast_lite_tpu.graphs.partition import (
    build_banded_halos,
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
@pytest.mark.parametrize("halo", ["gather", "banded"])
def test_sharded_processor_parity(rng, small_graph_set, use_ln, halo):
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
    halos = build_banded_halos(sg) if halo == "banded" else None
    x_sh = jnp.asarray(scatter_nodes(sg, np.asarray(x)))
    out_sh = sharded_interaction_processor(
        params, x_sh, sg, mesh, use_layer_norm=use_ln, halos=halos
    )
    got = gather_nodes(sg, np.asarray(out_sh))
    np.testing.assert_allclose(got, expect, atol=2e-4, rtol=2e-4)


def test_banded_halo_plan_invariants(rng, small_graph_set):
    """senders_ext must reference exactly the original sender rows after a
    simulated slab/hub exchange — checked host-side with id features."""
    gs = small_graph_set
    shard_of = partition_nodes_by_latitude(gs.mesh_lat, 8)
    sg = shard_graph(gs.processing, shard_of, 8)
    halos = build_banded_halos(sg)
    s_n, n_s, h, hh = 8, sg.nodes_per_shard, halos.slab_size, halos.hub_size

    # Node feature = its global padded-layout slot id.
    slot_ids = np.arange(s_n * n_s, dtype=np.int64).reshape(s_n, n_s)
    hub_all = np.concatenate(
        [slot_ids[o][halos.hub_idx[o]] for o in range(s_n)]
    )
    for s in range(s_n):
        from_down = (slot_ids[s - 1][halos.send_up[s - 1]]
                     if s - 1 >= 0 else np.zeros(h, np.int64))
        from_up = (slot_ids[s + 1][halos.send_down[s + 1]]
                   if s + 1 < s_n else np.zeros(h, np.int64))
        ext = np.concatenate([slot_ids[s], from_down, from_up, hub_all])
        live = sg.edge_mask[s] > 0
        got = ext[halos.senders_ext[s][live]]
        np.testing.assert_array_equal(got, sg.senders_global[s][live])

def test_banded_halo_volume_wins():
    """At realistic mesh sizes the banded plan must beat the all_gather
    baseline (measured: 18.8x at [3,5]/8 shards, 40.6x at [4,6]/8; the tiny
    [1,2] fixture is padding-dominated so we use [2,4] here)."""
    from graphcast_lite_tpu.graphs.build import build_graph_set

    lat = np.linspace(-87.1875, 87.1875, 32).astype(np.float32)
    lon = np.arange(0, 360, 5.625).astype(np.float32)
    gs = build_graph_set(lat, lon, [2, 4], grid2mesh_radius_query=0.6)
    shard_of = partition_nodes_by_latitude(gs.mesh_lat, 8)
    sg = shard_graph(gs.processing, shard_of, 8)
    halos = build_banded_halos(sg)
    stats = halos.rows_exchanged_per_step(sg)
    assert stats["banded"] * 4 < stats["all_gather_baseline"]
