"""Device-mesh sharding for multi-chip training (data × space).

The reference is strictly single-GPU (SURVEY §2.9: zero distributed code);
this layer is new TPU-native design.  Round-1 strategy ("let XLA insert the
collectives", scaling-book recipe):

* a 2-D ``jax.sharding.Mesh`` with axes ``("data", "space")``;
* batches sharded ``P("data", "space")`` — batch over data-parallel chips,
  the node axis over spatial chips (geographic row-blocks of the lat-major
  node order = latitude bands);
* parameters and graph topology replicated;
* the jitted train step carries in/out shardings, XLA/GSPMD propagates
  through the gather/segment ops and inserts all-gathers on the sender
  features and psums on the gradients (ICI collectives on real slices).

Explicit halo-exchange partitioning (edge-cut minimization, overlap with
compute) is the planned refinement on top of this baseline.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "choose_mesh_shape",
]


def choose_mesh_shape(n_devices: int, data_parallel: Optional[int] = None):
    """(data, space) axis sizes.  Prefer a balanced split: data gets the
    largest power-of-two divisor ≤ sqrt(n), space the rest."""
    if data_parallel is not None:
        assert n_devices % data_parallel == 0
        return data_parallel, n_devices // data_parallel
    data = 1
    while data * 2 <= int(np.sqrt(n_devices)) and n_devices % (data * 2) == 0:
        data *= 2
    return data, n_devices // data


def make_mesh(
    n_devices: Optional[int] = None,
    data_parallel: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    data, space = choose_mesh_shape(len(devices), data_parallel)
    dev_array = np.asarray(devices).reshape(data, space)
    return Mesh(dev_array, axis_names=("data", "space"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[B, G, ...] arrays: batch over 'data', nodes over 'space'."""
    return NamedSharding(mesh, P("data", "space"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh):
    return jax.device_put(x, batch_sharding(mesh))
