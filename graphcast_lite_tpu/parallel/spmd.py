"""Explicit SPMD message passing with shard_map (spatial axis).

The processor hot loop — the scaling-relevant compute — implemented as an
explicitly sharded program over a 1-D ``("space",)`` device mesh:

* every device owns one latitude band of mesh nodes (see
  ``graphs.partition``) plus the edges whose receivers it owns;
* per message-passing step, sender features cross shard boundaries via ONE
  collective (`all_gather` over "space" — the gather-by-owner halo; the
  multimesh's coarse levels connect distant bands so a pure neighbor
  exchange cannot cover them);
* aggregation, node/edge MLPs, and node-mode LayerNorm are purely local;
  the edge LayerNorm's *graph-mode* statistics are computed with masked
  `psum` over the space axis (bitwise-matching the unsharded statistics);
* parameters are broadcast (replicated in_spec).

``sharded_interaction_processor`` consumes the SAME parameter pytree as
``models.gnn.InteractionNetProcessor`` (the nn.scan stacked layout), so a
model trained single-chip runs sharded unchanged — parity is tested on an
8-device CPU mesh (tests/test_spmd.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graphs.partition import BandedHalos, ShardedGraph

__all__ = ["sharded_interaction_processor", "make_space_mesh"]


def make_space_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("space",))


def _silu(x):
    return jax.nn.silu(x)


def _masked_graph_ln(x, weight, bias, mask, axis_name, eps=1e-5):
    """PyG graph-mode LayerNorm with global (psum) masked statistics."""
    w = mask[:, None]
    c = x.shape[-1]
    local_sum = (x * w).sum()
    local_cnt = w.sum() * c
    total_sum = jax.lax.psum(local_sum, axis_name)
    total_cnt = jnp.maximum(jax.lax.psum(local_cnt, axis_name), 1.0)
    mean = total_sum / total_cnt
    local_var = (jnp.square(x - mean) * w).sum()
    var = jax.lax.psum(local_var, axis_name) / total_cnt
    out = (x - mean) / jnp.sqrt(var + eps)
    return out * weight + bias


def _node_ln(x, weight, bias, eps=1e-5):
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * weight + bias


def sharded_interaction_processor(
    params,                      # InteractionNetProcessor param subtree
    x_sharded: jnp.ndarray,      # [S, N_s, D] node latents (sharded layout)
    sgraph: ShardedGraph,
    mesh: Mesh,
    use_layer_norm: bool = True,
    halos: Optional[BandedHalos] = None,
) -> jnp.ndarray:
    """Run the full N-step InteractionNet processor SPMD over `mesh`.

    ``halos=None`` uses gather-by-owner (one full ``all_gather`` of node
    projections per step — correct for arbitrary edge spans).  Passing a
    ``BandedHalos`` plan switches to the banded exchange: sender projections
    are computed LOCALLY (the all_gather path recomputes them S× on every
    shard), then only the boundary slabs cross to the ±1 latitude bands via
    two ``ppermute``s and the small far-sender hub set (≈ the coarse-level
    mesh vertices) is replicated with one compact ``all_gather`` — ~10×
    less ICI traffic per message-passing step at [4,6]/8 shards.

    Returns processed node latents in the same sharded layout [S, N_s, D].
    """
    if halos is not None:
        return _banded_interaction_processor(
            params, x_sharded, sgraph, mesh, halos, use_layer_norm
        )
    p = params["params"] if "params" in params else params
    enc = p["edge_encoder_lin"]
    steps = p["steps"]["layer"]
    num_steps = steps["node_mlp"]["lin_0"]["kernel"].shape[0]
    n_s = sgraph.nodes_per_shard
    d = x_sharded.shape[-1]

    senders = jnp.asarray(sgraph.senders_global)       # [S, E]
    receivers = jnp.asarray(sgraph.receivers_local)    # [S, E]
    edge_mask = jnp.asarray(sgraph.edge_mask)          # [S, E]
    edge_attr = jnp.asarray(sgraph.edge_attr)          # [S, E, 4]
    node_mask = jnp.asarray(sgraph.node_mask)          # [S, N_s]

    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P("space"), P("space"), P("space"), P("space"),
                  P("space")),
        out_specs=P("space"),
    )
    def run(p_all, x, snd, rcv, emask, eattr):
        # Shapes inside: x [1, N_s, D]; snd/rcv/emask [1, E]; eattr [1, E, 4]
        x = x[0]
        snd, rcv, emask, eattr = snd[0], rcv[0], emask[0], eattr[0]
        enc_p, steps_p = p_all

        e = _silu(eattr @ enc_p["kernel"] + enc_p["bias"])  # [E, D]

        def body(carry, step_p):
            x, e = carry
            # --- halo: gather-by-owner of node features ------------------
            x_all = jax.lax.all_gather(x, "space", tiled=True)  # [S*N_s, D]
            k0 = step_p["edge_mlp"]["lin_0"]["kernel"]
            b0 = step_p["edge_mlp"]["lin_0"]["bias"]
            # Split first matmul: node-space projections, then halo gather.
            xs = x_all @ k0[:d]
            xr_local = x @ k0[d : 2 * d]
            ep = e @ k0[2 * d :]
            h = (
                jnp.take(xs, snd, axis=0)
                + jnp.take(xr_local, rcv, axis=0)
                + ep + b0
            )
            h = _silu(h)
            e_upd = h @ step_p["edge_mlp"]["lin_1"]["kernel"] + (
                step_p["edge_mlp"]["lin_1"]["bias"]
            )
            # --- local aggregation (receivers owned here) ----------------
            msgs = e_upd * emask[:, None]
            agg = jax.ops.segment_sum(msgs, rcv, num_segments=n_s)
            deg = jax.ops.segment_sum(emask, rcv, num_segments=n_s)
            agg = agg / jnp.maximum(deg, 1.0)[:, None]
            node_in = jnp.concatenate([x, agg], axis=-1)
            h2 = _silu(
                node_in @ step_p["node_mlp"]["lin_0"]["kernel"]
                + step_p["node_mlp"]["lin_0"]["bias"]
            )
            n_upd = h2 @ step_p["node_mlp"]["lin_1"]["kernel"] + (
                step_p["node_mlp"]["lin_1"]["bias"]
            )
            new_e = e + e_upd
            new_x = x + n_upd
            if use_layer_norm:
                new_e = _masked_graph_ln(
                    new_e, step_p["edge_norm"]["weight"],
                    step_p["edge_norm"]["bias"], emask, "space",
                )
                new_x = _node_ln(
                    new_x, step_p["node_norm"]["weight"],
                    step_p["node_norm"]["bias"],
                )
            return (new_x, new_e), None

        (x, e), _ = jax.lax.scan(body, (x, e), steps_p)
        return x[None]

    del node_mask  # padded node rows are inert by construction
    return run(
        (enc, steps), x_sharded, senders, receivers, edge_mask, edge_attr,
    )


def _banded_interaction_processor(
    params,
    x_sharded: jnp.ndarray,
    sgraph: ShardedGraph,
    mesh: Mesh,
    halos: BandedHalos,
    use_layer_norm: bool = True,
) -> jnp.ndarray:
    """Banded-halo SPMD processor (see ``sharded_interaction_processor``)."""
    p = params["params"] if "params" in params else params
    enc = p["edge_encoder_lin"]
    steps = p["steps"]["layer"]
    n_s = sgraph.nodes_per_shard
    d = x_sharded.shape[-1]
    s_n = int(np.prod(mesh.devices.shape))

    senders_ext = jnp.asarray(halos.senders_ext)   # [S, E] -> ext table
    receivers = jnp.asarray(sgraph.receivers_local)
    edge_mask = jnp.asarray(sgraph.edge_mask)
    edge_attr = jnp.asarray(sgraph.edge_attr)
    send_up = jnp.asarray(halos.send_up)           # [S, H]
    send_down = jnp.asarray(halos.send_down)       # [S, H]
    hub_idx = jnp.asarray(halos.hub_idx)           # [S, Hh]

    up_perm = [(i, i + 1) for i in range(s_n - 1)]
    down_perm = [(i, i - 1) for i in range(1, s_n)]

    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P("space"), P("space"), P("space"), P("space"),
                  P("space"), P("space"), P("space"), P("space")),
        out_specs=P("space"),
    )
    def run(p_all, x, snd_ext, rcv, emask, eattr, s_up, s_dn, hub):
        x = x[0]
        snd_ext, rcv, emask, eattr = (
            snd_ext[0], rcv[0], emask[0], eattr[0]
        )
        s_up, s_dn, hub = s_up[0], s_dn[0], hub[0]
        enc_p, steps_p = p_all

        e = _silu(eattr @ enc_p["kernel"] + enc_p["bias"])

        def body(carry, step_p):
            x, e = carry
            k0 = step_p["edge_mlp"]["lin_0"]["kernel"]
            b0 = step_p["edge_mlp"]["lin_0"]["bias"]
            # Project locally FIRST; only projections travel.
            xs = x @ k0[:d]                                   # [N_s, Dh]
            xr = x @ k0[d : 2 * d]
            ep = e @ k0[2 * d :]
            # --- halo exchange on projections -----------------------------
            from_down = jax.lax.ppermute(
                jnp.take(xs, s_up, axis=0), "space", up_perm
            )
            from_up = jax.lax.ppermute(
                jnp.take(xs, s_dn, axis=0), "space", down_perm
            )
            hub_all = jax.lax.all_gather(
                jnp.take(xs, hub, axis=0), "space", tiled=True
            )                                                  # [S*Hh, Dh]
            xs_ext = jnp.concatenate([xs, from_down, from_up, hub_all], 0)
            h = (
                jnp.take(xs_ext, snd_ext, axis=0)
                + jnp.take(xr, rcv, axis=0)
                + ep + b0
            )
            h = _silu(h)
            e_upd = h @ step_p["edge_mlp"]["lin_1"]["kernel"] + (
                step_p["edge_mlp"]["lin_1"]["bias"]
            )
            msgs = e_upd * emask[:, None]
            agg = jax.ops.segment_sum(msgs, rcv, num_segments=n_s)
            deg = jax.ops.segment_sum(emask, rcv, num_segments=n_s)
            agg = agg / jnp.maximum(deg, 1.0)[:, None]
            node_in = jnp.concatenate([x, agg], axis=-1)
            h2 = _silu(
                node_in @ step_p["node_mlp"]["lin_0"]["kernel"]
                + step_p["node_mlp"]["lin_0"]["bias"]
            )
            n_upd = h2 @ step_p["node_mlp"]["lin_1"]["kernel"] + (
                step_p["node_mlp"]["lin_1"]["bias"]
            )
            new_e = e + e_upd
            new_x = x + n_upd
            if use_layer_norm:
                new_e = _masked_graph_ln(
                    new_e, step_p["edge_norm"]["weight"],
                    step_p["edge_norm"]["bias"], emask, "space",
                )
                new_x = _node_ln(
                    new_x, step_p["node_norm"]["weight"],
                    step_p["node_norm"]["bias"],
                )
            return (new_x, new_e), None

        (x, e), _ = jax.lax.scan(body, (x, e), steps_p)
        return x[None]

    return run(
        (enc, steps), x_sharded, senders_ext, receivers, edge_mask,
        edge_attr, send_up, send_down, hub_idx,
    )
