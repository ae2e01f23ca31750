"""Tests for dataset ETL and the regional composition pipelines."""

import json
import os

import numpy as np
import pytest

from graphcast_lite_tpu.data.etl import (
    add_time_features,
    build_downscaler_dataset,
    build_multires_dataset,
    recompute_scalers,
    repair_dataset,
    welford_scalers,
)
from graphcast_lite_tpu.data.synthetic import generate_synthetic_dataset
from graphcast_lite_tpu.inference.regional_pipelines import (
    blend_with_background,
    cascade_refine,
    crop_region,
    interpolate_to_region,
)
from graphcast_lite_tpu.inference.maps import pixel_metrics, plot_metric_maps


def test_welford_matches_direct(tmp_path):
    d = generate_synthetic_dataset(str(tmp_path / "d"), n_time=20, n_lon=8,
                                   n_lat=6, n_feat=3)
    mm = np.memmap(os.path.join(d, "data.npy"), np.float16, "r",
                   shape=(20, 8, 6, 3))
    mean, std, n = welford_scalers(mm, chunk=7)
    full = np.asarray(mm, np.float64).reshape(-1, 3)
    np.testing.assert_allclose(mean, full.mean(0), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(std, full.std(0), rtol=1e-4, atol=1e-4)
    assert n == full.shape[0]
    m2, s2 = recompute_scalers(d)
    scl = np.load(os.path.join(d, "scalers.npz"))
    np.testing.assert_allclose(scl["mean"], m2)


def test_add_time_features(tmp_path):
    d = generate_synthetic_dataset(str(tmp_path / "d"), n_time=16, n_lon=8,
                                   n_lat=6, n_feat=3)
    out = add_time_features(d, str(tmp_path / "d_tf"), step_hours=6)
    with open(os.path.join(out, "dataset_info.json")) as f:
        info = json.load(f)
    assert info["n_feat"] == 7
    mm = np.memmap(os.path.join(out, "data.npy"), np.float16, "r",
                   shape=(16, 8, 6, 7))
    # t=0: hour 0 -> sin=0, cos=1 everywhere.
    np.testing.assert_allclose(np.asarray(mm[0, :, :, 3], np.float32), 0.0,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(mm[0, :, :, 4], np.float32), 1.0,
                               atol=1e-3)
    # t=2: hour 12 -> cos = -1.
    np.testing.assert_allclose(np.asarray(mm[2, :, :, 4], np.float32), -1.0,
                               atol=1e-3)
    with open(os.path.join(out, "variables.json")) as f:
        assert json.load(f)[-4:] == ["sin_hour", "cos_hour", "sin_doy",
                                     "cos_doy"]


def test_repair_dataset(tmp_path):
    d = generate_synthetic_dataset(str(tmp_path / "d"), n_time=8, n_lon=4,
                                   n_lat=4, n_feat=2)
    with open(os.path.join(d, "variables.json"), "w") as f:
        json.dump(["msl", "t2m"], f)
    before = np.asarray(
        np.memmap(os.path.join(d, "data.npy"), np.float16, "r",
                  shape=(8, 4, 4, 2))[0, 0, 0, 0], np.float32)
    scl_before = np.load(os.path.join(d, "scalers.npz"))["mean"][0]
    repair_dataset(d, {"msl": 0.01})
    after = np.asarray(
        np.memmap(os.path.join(d, "data.npy"), np.float16, "r",
                  shape=(8, 4, 4, 2))[0, 0, 0, 0], np.float32)
    scl_after = np.load(os.path.join(d, "scalers.npz"))["mean"][0]
    np.testing.assert_allclose(after, before * 0.01, rtol=1e-2)
    np.testing.assert_allclose(scl_after, scl_before * 0.01, rtol=1e-6)


def test_build_multires_and_downscaler(tmp_path):
    coarse = generate_synthetic_dataset(str(tmp_path / "c"), n_time=6,
                                        n_lon=16, n_lat=8, n_feat=3, seed=1)
    fine = generate_synthetic_dataset(str(tmp_path / "f"), n_time=6,
                                      n_lon=32, n_lat=16, n_feat=3, seed=1)
    roi = (-40.0, 40.0, 90.0, 180.0)
    out = build_multires_dataset(coarse, fine, str(tmp_path / "m"), roi)
    with open(os.path.join(out, "dataset_info.json")) as f:
        info = json.load(f)
    assert info["flat"] and info["n_nodes"] > 0
    cz = np.load(os.path.join(out, "coords.npz"))
    assert cz["is_regional"].sum() == 32 * 16
    # Coarse nodes all outside ROI.
    cl = cz["latitude"][~cz["is_regional"]]
    co = cz["longitude"][~cz["is_regional"]]
    inside = ((cl >= roi[0]) & (cl <= roi[1]) & (co >= roi[2])
              & (co <= roi[3]))
    assert not inside.any()
    # Loadable through the standard loader.
    from graphcast_lite_tpu.data.dataset import load_chunked_datasets
    with open(os.path.join(out, "variables.json"), "w") as f:
        json.dump(["a", "b", "c"], f)
    tr, va, te, meta = load_chunked_datasets(out, obs_window=2, pred_steps=1)
    assert meta.flat_grid and meta.is_regional is not None
    x, y = tr.get(0)
    assert x.shape == (info["n_nodes"], 6)

    ds = build_downscaler_dataset(coarse, fine, str(tmp_path / "ds"))
    x = np.memmap(os.path.join(ds, "X_coarse.npy"), np.float16, "r",
                  shape=(6, 16, 32, 3))
    y = np.memmap(os.path.join(ds, "Y_fine.npy"), np.float16, "r",
                  shape=(6, 16, 32, 3))
    # Same generator seed: upsampled coarse should correlate with fine truth.
    xv = np.asarray(x[0], np.float32).reshape(-1)
    yv = np.asarray(y[0], np.float32).reshape(-1)
    corr = np.corrcoef(xv, yv)[0, 1]
    assert corr > 0.9


def test_regional_pipelines(rng):
    lats = np.linspace(-40, 40, 20)
    lons = np.linspace(0, 90, 30)
    g = 600
    field = rng.randn(g, 2).astype(np.float32)
    cropped, rl, ro = crop_region(field, lats, lons, (-10, 10, 30, 60))
    assert cropped.shape[0] == len(rl) and cropped.shape[1] == len(ro)

    # Interpolation of a linear field is exact.
    lon2, lat2 = np.meshgrid(lons, lats)
    lin = (2 * lat2 + 0.5 * lon2).reshape(-1, 1).astype(np.float32)
    dst_lats = np.linspace(-5, 5, 7)
    dst_lons = np.linspace(40, 50, 9)
    out = interpolate_to_region(lin, lats, lons, dst_lats, dst_lons)
    dlon2, dlat2 = np.meshgrid(dst_lons, dst_lats)
    np.testing.assert_allclose(out[:, :, 0], 2 * dlat2 + 0.5 * dlon2,
                               rtol=1e-5)

    # Blend: center keeps regional, border keeps background.
    reg = np.ones((12, 14, 1))
    bg = np.zeros((12, 14, 1))
    blended = blend_with_background(reg, bg, border=3)
    assert blended[6, 7, 0] == 1.0 and blended[0, 0, 0] == 0.0

    # Cascade with an identity-delta UNet stub adds zero.
    refined = cascade_refine(
        lambda x: np.zeros_like(x), lin, lats, lons, dst_lats, dst_lons
    )
    np.testing.assert_allclose(refined[:, :, 0], 2 * dlat2 + 0.5 * dlon2,
                               rtol=1e-5)


def test_pixel_metrics_and_maps(tmp_path, rng):
    n, g, c = 6, 48, 2
    gt = rng.randn(n, g, c)
    pred = gt + 0.5
    m = pixel_metrics(pred, gt, c)
    np.testing.assert_allclose(m["bias"], 0.5, atol=1e-9)
    np.testing.assert_allclose(m["rmse"], 0.5, atol=1e-9)
    np.testing.assert_allclose(m["acc"], 1.0, atol=1e-6)
    path = plot_metric_maps(
        m, np.linspace(-30, 30, 6), np.linspace(0, 70, 8), 0,
        str(tmp_path / "maps.png"),
    )
    assert os.path.exists(path)
