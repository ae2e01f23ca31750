"""Temporal product-graph construction (time-chain ⊗ spatial k-NN).

Reference builds a *dense* (T·N)² adjacency via ``np.kron`` and converts to
sparse (reference src/models.py:707-774) — O((T·N)²) memory, infeasible past
toy grids.  Here the same edge set is constructed directly in sparse COO:

  s01 · (I_T ⊗ A_space):  (t, i) → (t, j)   for every spatial edge (i, j)
  s10 · (A_time ⊗ I_N):   (t, i) → (t+1, i)
  s11 · (A_time ⊗ A_space): (t, i) → (t+1, j) for every spatial edge (i, j)

with node id = t·N + i (time-major) and (s01, s10, s11) selected by the
product type (KRONECKER (0,0,1), CARTESIAN (1,1,0), STRONG (1,1,1)).

NOTE on ordering: the reference reshapes its [G, obs·F] input as
``view(G·obs, F)`` — a *grid-major* row order — while its product adjacency
is built time-major; we implement the intended time-major semantics
(reshape [obs, G, F], last time slice = last N rows), which is the
self-consistent version of the same design.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from sklearn.neighbors import kneighbors_graph

from ..config import ProductGraphType

__all__ = ["build_product_graph_edges", "spatial_knn_adjacency"]


def spatial_knn_adjacency(
    grid_lat: np.ndarray, grid_lon: np.ndarray, k: int
) -> Tuple[np.ndarray, np.ndarray]:
    """k-NN spatial edges (senders, receivers) over (lat, lon) points in the
    lat-major flatten order, Euclidean metric in (lat, lon) space — matching
    reference src/models.py:729-743 (sklearn kneighbors_graph,
    include_self=False)."""
    pts = np.array([[lat, lon] for lat in grid_lat for lon in grid_lon])
    adj = kneighbors_graph(pts, n_neighbors=k, mode="connectivity",
                           include_self=False).tocoo()
    return adj.row.astype(np.int64), adj.col.astype(np.int64)


def build_product_graph_edges(
    grid_lat: np.ndarray,
    grid_lon: np.ndarray,
    obs_window: int,
    num_k: int,
    product_type: ProductGraphType,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sparse COO (senders, receivers) of the product graph over T·N nodes."""
    t_steps = obs_window
    sp_s, sp_r = spatial_knn_adjacency(grid_lat, grid_lon, num_k)
    n = len(grid_lat) * len(grid_lon)

    if product_type == ProductGraphType.KRONECKER:
        s01, s10, s11 = 0, 0, 1
    elif product_type == ProductGraphType.CARTESIAN:
        s01, s10, s11 = 1, 1, 0
    elif product_type == ProductGraphType.STRONG:
        s01, s10, s11 = 1, 1, 1
    else:  # pragma: no cover
        raise ValueError(product_type)

    senders, receivers = [], []
    for t in range(t_steps):
        base = t * n
        if s01:
            senders.append(sp_s + base)
            receivers.append(sp_r + base)
        if t + 1 < t_steps:
            nxt = (t + 1) * n
            if s10:
                ids = np.arange(n, dtype=np.int64)
                senders.append(ids + base)
                receivers.append(ids + nxt)
            if s11:
                senders.append(sp_s + base)
                receivers.append(sp_r + nxt)
    return (
        np.concatenate(senders) if senders else np.zeros(0, np.int64),
        np.concatenate(receivers) if receivers else np.zeros(0, np.int64),
    )
