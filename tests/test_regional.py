"""Tests for the dual-mesh and ROI-residual regional stacks, including the
single-sample overfit harness (the reference's sanity check,
scripts/train_dual_mesh.py:63-135)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from graphcast_lite_tpu.graphs.regional import (
    build_regional_graphs,
    build_roi_knn_graph,
    create_regional_mesh,
)
from graphcast_lite_tpu.models.dual_mesh import (
    DualMeshRegional,
    RegionalDeviceGraphs,
    dual_mesh_forward,
)
from graphcast_lite_tpu.models.roi_residual import (
    ROIResidualModule,
    roi_residual_forward,
)

ROI = (30.0, 60.0, 60.0, 120.0)


def _grid():
    lats = np.linspace(-80, 80, 20).astype(np.float32)
    lons = np.arange(0, 360, 15).astype(np.float32)
    lon2d, lat2d = np.meshgrid(lons, lats)
    return lat2d.reshape(-1), lon2d.reshape(-1)


def test_create_regional_mesh_excludes_global_prefix():
    mesh, lats, lons = create_regional_mesh(ROI, level=3, buffer_deg=5.0,
                                            global_level=2)
    assert mesh.num_vertices == len(lats) > 0
    # All inside buffered ROI.
    assert (lats >= 25.0 - 1e-4).all() and (lats <= 65.0 + 1e-4).all()
    assert (lons >= 55.0 - 1e-4).all() and (lons <= 125.0 + 1e-4).all()
    # None of the kept vertices coincide with a level-2 (global) vertex.
    from graphcast_lite_tpu.mesh.icosphere import build_hierarchy
    glob = build_hierarchy(2)[-1]
    d = np.linalg.norm(
        mesh.vertices[:, None] - glob.vertices[None], axis=-1
    ).min(axis=1)
    assert (d > 1e-5).all()


@pytest.fixture(scope="module")
def regional_setup():
    glats, glons = _grid()
    from graphcast_lite_tpu.mesh.icosphere import build_hierarchy
    from graphcast_lite_tpu.mesh.icosphere import mesh_lat_lon

    gmesh = build_hierarchy(2)[-1]
    mlats, mlons = mesh_lat_lon(gmesh)
    rg = build_regional_graphs(
        mlats, mlons, glats, glons, ROI,
        reg_mesh_level=3, reg_mesh_buffer=5.0, global_level=2,
    )
    return glats, glons, mlats, mlons, rg


def test_regional_graphs_shapes(regional_setup):
    glats, glons, mlats, mlons, rg = regional_setup
    assert rg.n_roi == int(rg.roi_mask.sum()) > 0
    assert rg.processing.num_edges > 0
    assert rg.cross_g2r.num_receivers == rg.n_reg_mesh
    assert rg.encoding.num_receivers == rg.n_reg_mesh
    assert rg.decoding.num_receivers == rg.n_roi
    # IDW weights sum to 1 per ROI grid point.
    w = np.asarray(rg.dec_idw)
    sums = np.zeros(rg.n_roi)
    np.add.at(sums, np.asarray(rg.decoding.receivers),
              w * np.asarray(rg.decoding.edge_mask))
    np.testing.assert_allclose(sums, 1.0, atol=1e-4)


def test_dual_mesh_overfit_single_sample(regional_setup):
    glats, glons, mlats, mlons, rg = regional_setup
    g = len(glats)
    n_glob_mesh = len(mlats)
    c, obs, d_g = 3, 2, 16
    graphs = RegionalDeviceGraphs.from_host(rg, g)

    rng = np.random.RandomState(0)
    x_grid = jnp.asarray(rng.randn(g, obs * c).astype(np.float32))
    target = jnp.asarray(rng.randn(g, c).astype(np.float32))

    # Fake frozen global model outputs (fixed functions of the input).
    w_pred = jnp.asarray(rng.randn(obs * c, c).astype(np.float32) * 0.1)
    w_lat = jnp.asarray(rng.randn(obs * c, d_g).astype(np.float32) * 0.1)
    mesh_lat = jnp.asarray(rng.randn(n_glob_mesh, d_g).astype(np.float32))

    def global_apply(x):
        return x @ w_pred, x @ w_lat, mesh_lat

    module = DualMeshRegional(hidden_dim=32, output_channels=c,
                              processor_steps=2)
    params = module.init(
        jax.random.PRNGKey(0),
        jnp.zeros((rg.n_roi, obs * c)),
        jnp.zeros((rg.n_roi, d_g)),
        mesh_lat, graphs,
    )

    def loss_fn(p):
        def regional_apply(rr, rl, ml):
            return module.apply(p, rr, rl, ml, graphs)

        out = dual_mesh_forward(global_apply, regional_apply, x_grid, graphs)
        roi = graphs.roi_idx
        return jnp.mean(jnp.square(out[roi] - target[roi]))

    # At init the correction is ~0: output ≈ global prediction.
    out0 = dual_mesh_forward(
        global_apply,
        lambda rr, rl, ml: module.apply(params, rr, rl, ml, graphs),
        x_grid, graphs,
    )
    np.testing.assert_allclose(
        np.asarray(out0), np.asarray(x_grid @ w_pred), atol=0.05
    )
    # Non-ROI rows are exactly the global prediction.
    non_roi = np.setdiff1d(np.arange(g), np.asarray(graphs.roi_idx))
    np.testing.assert_allclose(
        np.asarray(out0)[non_roi], np.asarray(x_grid @ w_pred)[non_roi],
        atol=1e-6,
    )

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    step = jax.jit(lambda p, s: _train_step(p, s, loss_fn, opt))
    l0 = float(loss_fn(params))
    for _ in range(40):
        params, opt_state, loss = step(params, opt_state)
    assert float(loss) < l0 * 0.8, (float(loss), l0)


def _train_step(params, opt_state, loss_fn, opt):
    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


def test_roi_residual_overfit(regional_setup):
    glats, glons, *_ = regional_setup
    g = len(glats)
    c, obs, d_g = 3, 2, 16
    roi_mask, roi_graph = build_roi_knn_graph(glats, glons, ROI, k=4)
    roi_idx = jnp.asarray(np.flatnonzero(roi_mask))

    rng = np.random.RandomState(1)
    x_grid = jnp.asarray(rng.randn(g, obs * c).astype(np.float32))
    target = jnp.asarray(rng.randn(g, c).astype(np.float32))
    w_pred = jnp.asarray(rng.randn(obs * c, c).astype(np.float32) * 0.1)
    w_lat = jnp.asarray(rng.randn(obs * c, d_g).astype(np.float32) * 0.1)

    def global_apply(x):
        return x @ w_pred, x @ w_lat, None

    module = ROIResidualModule(hidden_dim=32, output_channels=c,
                               processor_steps=2)
    n_roi = int(roi_mask.sum())
    params = module.init(
        jax.random.PRNGKey(0),
        jnp.zeros((n_roi, obs * c)), jnp.zeros((n_roi, d_g)),
        jnp.zeros((n_roi, c)), roi_graph,
    )

    def loss_fn(p):
        out = roi_residual_forward(
            global_apply,
            lambda rr, rl, rp, gr: module.apply(p, rr, rl, rp, gr),
            x_grid, roi_idx, roi_graph,
        )
        return jnp.mean(jnp.square(out[roi_idx] - target[roi_idx]))

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    step = jax.jit(lambda p, s: _train_step(p, s, loss_fn, opt))
    l0 = float(loss_fn(params))
    for _ in range(40):
        params, opt_state, loss = step(params, opt_state)
    assert float(loss) < l0 * 0.8
