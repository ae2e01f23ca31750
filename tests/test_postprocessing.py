"""Tests for the post-processing ladder."""

from datetime import datetime

import numpy as np

from graphcast_lite_tpu.postprocessing.corrections import (
    apply_lapse_rate,
    apply_mos_t2m,
    blend_boundary,
    build_mos_features,
    geopotential_to_elevation,
    get_t2m_bias,
    idw_interpolate_bias,
    solar_elevation,
)


def test_mos_table():
    table = {"bias_table": {"1": {"6": -1.5}, "7": {"12": 0.8}}}
    assert get_t2m_bias(table, datetime(2024, 1, 5, 6)) == -1.5
    assert get_t2m_bias(table, datetime(2024, 7, 5, 12)) == 0.8
    assert get_t2m_bias(table, datetime(2024, 3, 5, 0)) == 0.0

    pred = np.zeros((4, 2, 3))
    out = apply_mos_t2m(
        pred, ["10u", "t2m", "msl"], table,
        [datetime(2024, 1, 5, 6), datetime(2024, 1, 5, 12)],
    )
    assert (out[:, 0, 1] == -1.5).all()
    assert (out[:, 1, 1] == 0.0).all()
    assert out[:, :, 0].sum() == 0 and out[:, :, 2].sum() == 0


def test_solar_elevation_daynight():
    # Local noon at Greenwich equinox: high sun; midnight: below horizon.
    noon = solar_elevation(0.0, 0.0, datetime(2024, 3, 20, 12))
    midnight = solar_elevation(0.0, 0.0, datetime(2024, 3, 20, 0))
    assert noon > 80.0
    assert midnight < -80.0


def test_mos_features_shape():
    vals = np.array([280.0, 2.0, -1.0, 100000.0])
    f = build_mos_features(
        vals, ["t2m", "10u", "10v", "sp"], datetime(2024, 6, 1, 6),
        56.0, 92.0, 287.0, prev_t2m_c=5.0,
    )
    assert f.shape == (20,)
    assert abs(f[0] - (280.0 - 273.15)) < 1e-9     # t2m in C
    assert abs(f[2] - np.hypot(2.0, -1.0)) < 1e-9  # wind speed
    assert abs(f[5] - 1000.0) < 1e-9               # sp in hPa
    assert f[15] == 5.0                            # lag feature


def test_idw_interpolation():
    lats = np.array([0.0, 0.0, 0.0, 50.0])
    lons = np.array([0.0, 1.0, 2.0, 180.0])
    biases = {0: np.array([2.0, 4.0]), 2: np.array([-2.0, 0.0])}
    field = idw_interpolate_bias(biases, lats, lons, 2, max_radius_km=500.0)
    np.testing.assert_allclose(field[0], [2.0, 4.0])
    np.testing.assert_allclose(field[2], [-2.0, 0.0])
    # Node 1 is equidistant -> average.
    np.testing.assert_allclose(field[1], [0.0, 2.0], atol=1e-6)
    # Node 3 is beyond the radius -> zero.
    np.testing.assert_allclose(field[3], [0.0, 0.0])


def test_lapse_rate():
    t = np.array([280.0])
    out = apply_lapse_rate(t, np.array([1000.0]), np.array([0.0]))
    np.testing.assert_allclose(out, [286.5])
    np.testing.assert_allclose(
        geopotential_to_elevation(np.array([9.80665 * 100])), [100.0]
    )


def test_blend_boundary():
    pred = np.full((4, 2), 1.0)
    back = np.full((4, 2), 3.0)
    taper = np.array([1.0, 0.5, 0.0, 0.25])
    out = blend_boundary(pred, back, taper)
    np.testing.assert_allclose(out[:, 0], [1.0, 2.0, 3.0, 2.5])
