"""Offline WRF-comparison harness (VERDICT r2 item 10): the full metric
surface of reference scripts/compare_wrf.py driven by injected fixture
WRF/ERA5 arrays — no live WRF output needed."""

import json

import numpy as np
import pytest

from graphcast_lite_tpu.cli.compare_wrf import (
    VAR_MAPPING,
    build_comparison,
    compute_metrics,
    domain_mask,
    domain_means,
    load_wrf,
    load_wrf_json,
    render_tables,
)
from graphcast_lite_tpu.cli import compare_wrf as cw


def _fixture_wrf_json(tmp_path, hourly_t2):
    data = {
        "domain": "d03 Krasnoyarsk",
        "times": [f"2023-01-20_{h:02d}" for h in range(len(hourly_t2))],
        "domain_mean": {
            "t2_K": [float(v) for v in hourly_t2],
            "u10_ms": [float(v) for v in np.linspace(1, 3, len(hourly_t2))],
            "v10_ms": [float(v) for v in np.linspace(-1, 1, len(hourly_t2))],
            "psfc_Pa": [98000.0] * len(hourly_t2),
        },
    }
    p = tmp_path / "wrf_d03.json"
    p.write_text(json.dumps(data))
    return str(p)


def test_load_wrf_json_units_and_steps(tmp_path):
    hourly = 250.0 + np.arange(25, dtype=np.float32)
    path = _fixture_wrf_json(tmp_path, hourly)
    wrf = load_wrf_json(path)
    # 25 hourly values -> [0, 6, 12, 18, 24] (init + 4 horizons)
    assert wrf["t2m"].shape == (5,)
    np.testing.assert_allclose(wrf["t2m"], hourly[[0, 6, 12, 18, 24]])
    # PSFC Pa -> hPa (our dataset unit)
    np.testing.assert_allclose(wrf["sp"], 980.0)


def test_load_wrf_netcdf_injected():
    fields = {
        "T2": 250.0 + np.zeros((25, 4, 4), np.float32)
        + np.arange(25, dtype=np.float32)[:, None, None],
        "PSFC": np.full((25, 4, 4), 98000.0, np.float32),
    }
    wrf = load_wrf("dummy.nc", open_netcdf=lambda p: fields)
    np.testing.assert_allclose(wrf["t2m"], [250, 256, 262, 268, 274])
    np.testing.assert_allclose(wrf["sp"], 980.0)
    assert "10u" not in wrf  # missing fields skipped, not fatal


def test_full_comparison_fixture(tmp_path):
    """End-to-end over synthetic fields: our model beats WRF on t2m by
    construction and the tables say so."""
    rng = np.random.RandomState(0)
    n_lat, n_lon = 8, 12
    lats = np.linspace(55.0, 57.0, n_lat).astype(np.float32)
    lons = np.linspace(91.0, 95.0, n_lon).astype(np.float32)
    lon2d, lat2d = np.meshgrid(lons, lats)
    node_lats, node_lons = lat2d.ravel(), lon2d.ravel()
    g = n_lat * n_lon
    var_names = ["t2m", "10u", "10v", "sp"]
    c, p_steps, n_samples = 4, 4, 3
    mean = np.array([260.0, 0.0, 0.0, 970.0], np.float32)
    std = np.array([10.0, 2.0, 2.0, 15.0], np.float32)

    truth_phys = np.stack([
        260.0 + rng.randn(n_samples, g, p_steps).astype(np.float32),
        rng.randn(n_samples, g, p_steps).astype(np.float32),
        rng.randn(n_samples, g, p_steps).astype(np.float32),
        970.0 + rng.randn(n_samples, g, p_steps).astype(np.float32),
    ], axis=-1)                                     # [n, G, P, C]
    pred_phys = truth_phys + 0.1 * rng.randn(*truth_phys.shape).astype(
        np.float32)                                  # ours: tiny error

    def normalize(a):
        return ((a - mean) / std).reshape(n_samples, g, p_steps * c)

    mask = domain_mask(node_lats, node_lons)
    assert mask.any() and not mask.all()
    pred_mean, truth_mean = domain_means(
        normalize(pred_phys), normalize(truth_phys), mask, mean, std, c)
    assert pred_mean.shape == (n_samples, p_steps, c)
    # domain_means round-trips the normalization (fp32 tolerances)
    manual = truth_phys[:, mask].mean(axis=1)
    np.testing.assert_allclose(truth_mean, manual, rtol=1e-4, atol=1e-3)

    # WRF fixture: biased +2 K on t2m -> our model must win that var
    wrf_sample = 1
    t2_domain = truth_phys[wrf_sample][mask][:, :, 0].mean(axis=0)  # [P]
    hourly = np.full(25, t2_domain[0] + 2.0, np.float32)
    for h in range(4):
        hourly[(h + 1) * 6] = t2_domain[h] + 2.0
    wrf_path = _fixture_wrf_json(tmp_path, hourly)
    wrf_data = load_wrf(wrf_path)

    result = build_comparison(pred_mean, truth_mean, var_names, wrf_data,
                              wrf_sample)
    assert set(result["ours"]) == set(var_names)
    for var in var_names:
        assert result["ours"][var]["rmse"] < 0.2  # pred ~ truth + 0.1 noise
        assert len(result["ours"][var]["per_horizon"]) == 4
    t2 = result["wrf"]["t2m"]
    assert t2["winner"] == "ours"
    assert t2["wrf_rmse"] == pytest.approx(2.0, abs=0.3)
    assert len(t2["rows"]) == 4
    assert all(r["winner"] == "ours" for r in t2["rows"])

    text = render_tables(result)
    assert "OUR MODEL metrics" in text and "WRF vs ERA5 vs Ours" in text
    assert "<- us" in text


def test_metric_helpers():
    rmse, mae, bias = compute_metrics(np.array([1.0, 3.0]),
                                      np.array([0.0, 1.0]))
    assert rmse == pytest.approx(np.sqrt(2.5))
    assert mae == pytest.approx(1.5)
    assert bias == pytest.approx(1.5)
    assert set(VAR_MAPPING) == {"t2m", "10u", "10v", "sp"}
    assert cw.VAR_MAPPING["sp"]["wrf_to_ours"] == 0.01
