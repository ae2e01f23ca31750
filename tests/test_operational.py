"""Tests for the live/operational layer: runtime bundle export + live
forecast with an injected (offline) analysis source."""

import datetime

import numpy as np

from graphcast_lite_tpu.operational.bundle import (
    export_runtime_bundle,
    load_runtime_bundle,
)
from graphcast_lite_tpu.operational.live import (
    render_summary_markdown,
    run_live_forecast,
)


def test_bundle_and_live_forecast(tmp_path):
    from tests.test_training import small_experiment
    from graphcast_lite_tpu.training.trainer import Trainer
    import json

    cfg, model, graphs, train_ds, val_ds, _, meta = small_experiment(
        tmp_path, n_feat=5, static=(3,), forcing=()
    )
    trainer = Trainer(model, graphs, cfg, meta, str(tmp_path / "exp"))
    state = trainer.init_state(seed=0)
    cfg2 = cfg.model_copy(update={"num_epochs": 1})
    trainer.config = cfg2
    trainer.fit(state, train_ds, val_ds, print_losses=False,
                max_steps_per_epoch=2)

    # Write config.json (the demo path writes it; small_experiment doesn't).
    with open(tmp_path / "exp" / "config.json", "w") as f:
        f.write(cfg.model_dump_json())
    # variables.json with recognizable names for the summary renderer.
    with open(tmp_path / "data" / "variables.json", "w") as f:
        json.dump(["t2m", "10u", "10v", "lsm", "forcing"], f)

    bundle_dir = export_runtime_bundle(
        str(tmp_path / "exp"), str(tmp_path / "data"), str(tmp_path / "bundle")
    )
    bundle = load_runtime_bundle(bundle_dir)
    assert bundle.num_nodes == 16 * 8
    assert bundle.static_values is not None
    assert bundle.static_values.shape == (128, 1)
    assert bundle.variables[0] == "t2m"

    # Offline "analysis": physical-unit fields consistent with the scalers.
    rng = np.random.RandomState(0)

    def fetch(cycle):
        g = bundle.num_nodes
        return {
            name: bundle.mean[i] + bundle.std[i] * rng.randn(g).astype(np.float32)
            for i, name in enumerate(bundle.variables)
        }

    fc = run_live_forecast(
        bundle_dir, fetch, ar_steps=2,
        base_time=datetime.datetime(2026, 1, 1, 0),
    )
    assert fc.predictions_phys.shape == (128, 2, 5)
    assert np.isfinite(fc.predictions_phys).all()
    # Static channel must equal the bundle template in physical units.
    expect_static = bundle.static_values[:, 0] * bundle.std[3] + bundle.mean[3]
    np.testing.assert_allclose(
        fc.predictions_phys[:, 0, 3], expect_static, rtol=1e-4
    )

    md = render_summary_markdown(fc, city_name="TestCity",
                                 city_lat=10.0, city_lon=50.0,
                                 out_path=str(tmp_path / "summary.md"))
    assert "TestCity" in md and "2026-01-01" in md
    assert (tmp_path / "summary.md").exists()


def test_interp_to_nodes_wraps_longitude():
    from graphcast_lite_tpu.operational.live import GribField, interp_to_nodes

    # Source grid with a seam at 0/360; field = cos(lon) so the wrap cell
    # has a known analytic value.
    lats = np.linspace(-80, 80, 33)
    lons = np.arange(0.0, 360.0, 10.0)
    lo2, la2 = np.meshgrid(lons, lats)
    vals = np.cos(np.radians(lo2))
    f = GribField(lats=lats, lons=lons, values=vals)

    # Node at lon=355 sits between the last column (350) and the wrap (0).
    out = interp_to_nodes(f, np.array([0.0]), np.array([355.0]))
    expect = 0.5 * (np.cos(np.radians(350.0)) + np.cos(0.0))
    np.testing.assert_allclose(out[0], expect, atol=1e-6)

    # Interior exactness at grid points; -5 == 355 (wrapping convention).
    out2 = interp_to_nodes(f, np.array([0.0, 0.0]), np.array([90.0, -5.0]))
    np.testing.assert_allclose(out2[0], 0.0, atol=1e-7)
    np.testing.assert_allclose(out2[1], expect, atol=1e-6)


def test_extract_live_channels():
    from graphcast_lite_tpu.operational.live import (
        GribField,
        extract_live_channels,
    )

    lats = np.linspace(-80, 80, 17)
    lons = np.arange(0.0, 360.0, 30.0)

    def const_field(v):
        return GribField(lats=lats, lons=lons,
                         values=np.full((len(lats), len(lons)), v, np.float32))

    payload = {
        "t2m": {"2t": const_field(280.0)},
        "sp": {"pres": const_field(98000.0)},        # Pa -> expect hPa
        "isobaric_t": {"t": {850: const_field(270.0),
                             500: const_field(250.0)}},
        "isobaric_z": {"gh": {500: const_field(5500.0)}},
    }
    node_lats = np.array([0.0, 45.0])
    node_lons = np.array([100.0, 200.0])
    var_order = ["t2m", "sp", "t@850", "t@500", "z@500", "tp", "lsm", "weird"]
    template = {"lsm": np.array([1.0, 0.0], np.float32)}

    fields, warnings = extract_live_channels(
        payload, node_lats, node_lons, var_order, template
    )
    np.testing.assert_allclose(fields["t2m"], 280.0, atol=1e-4)
    np.testing.assert_allclose(fields["sp"], 980.0, atol=1e-4)   # Pa->hPa
    np.testing.assert_allclose(fields["t@850"], 270.0, atol=1e-4)
    np.testing.assert_allclose(fields["t@500"], 250.0, atol=1e-4)
    np.testing.assert_allclose(fields["z@500"], 5500.0, atol=1e-3)
    np.testing.assert_allclose(fields["lsm"], [1.0, 0.0])        # template
    np.testing.assert_allclose(fields["tp"], 0.0)                # zero-fill
    np.testing.assert_allclose(fields["weird"], 0.0)
    assert any("tp" in w for w in warnings)
    assert any("weird" in w.lower() or "Unsupported" in w for w in warnings)


def test_render_t2m_map(tmp_path):
    from graphcast_lite_tpu.operational.live import LiveForecast, render_t2m_map

    lat = np.linspace(-80, 80, 8)
    lon = np.linspace(0, 350, 16)
    preds = np.random.RandomState(0).randn(128, 2, 3).astype(np.float32) + 280
    fc = LiveForecast(
        predictions_phys=preds,
        valid_times=[datetime.datetime(2026, 1, 1, 6),
                     datetime.datetime(2026, 1, 1, 12)],
        variables=["t2m", "10u", "10v"],
        latitude=lat, longitude=lon,
    )
    p = render_t2m_map(fc, str(tmp_path / "t2m.png"), step=1,
                       city_name="X", city_lat=10.0, city_lon=50.0)
    assert p is not None and (tmp_path / "t2m.png").stat().st_size > 1000
