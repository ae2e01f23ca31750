"""Tests for nudging and optimal-interpolation assimilation."""

import numpy as np

from graphcast_lite_tpu.assimilation.nudging import (
    NudgingAssimilator,
    boundary_taper_mask,
    cosine_taper_2d,
    feature_mask_from_indices,
    feature_mask_from_names,
    nudge_offline,
)
from graphcast_lite_tpu.assimilation.optimal_interpolation import (
    OptimalInterpolation,
    haversine_matrix,
)


def test_nudging_basic():
    f = np.zeros((4, 3), np.float32)
    obs = np.full((4, 3), np.nan, np.float32)
    obs[1, 1] = 2.0
    obs[2, 0] = -4.0
    out = NudgingAssimilator(alpha=0.5).apply(f, obs)
    assert out[1, 1] == 1.0
    assert out[2, 0] == -2.0
    assert (out[obs != obs] == 0).all()  # NaN sites untouched


def test_nudging_feature_mask():
    f = np.zeros((4, 3), np.float32)
    obs = np.ones((4, 3), np.float32)
    mask = feature_mask_from_indices([0, 2], 3)
    out = NudgingAssimilator(alpha=1.0, feature_mask=mask).apply(f, obs)
    assert (out[:, 0] == 1).all() and (out[:, 2] == 1).all()
    assert (out[:, 1] == 0).all()
    m2 = feature_mask_from_names(["a", "b", "c"], ["b"])
    np.testing.assert_array_equal(m2, [False, True, False])


def test_nudge_offline():
    pred = np.zeros((5, 2))
    obs = np.full((5, 2), np.nan)
    obs[0, 0] = 4.0
    out = nudge_offline(pred, obs, alpha=0.25)
    assert out[0, 0] == 1.0
    assert out[1:].sum() == 0


def test_taper_masks():
    t = cosine_taper_2d(10, 12, 3)
    assert t.shape == (10, 12)
    assert t[5, 6] == 1.0
    assert t[0, 0] == 0.0
    flat = boundary_taper_mask(10, 12, 3)
    assert flat.shape == (120,)
    np.testing.assert_allclose(flat.reshape(10, 12), t)


def test_haversine():
    c1 = np.array([[0.0, 0.0]])
    c2 = np.array([[0.0, 180.0], [90.0, 0.0]])
    d = haversine_matrix(c1, c2)
    # Antipode: half circumference; pole: quarter.
    np.testing.assert_allclose(d[0, 0], np.pi * 6371000.0, rtol=1e-6)
    np.testing.assert_allclose(d[0, 1], np.pi / 2 * 6371000.0, rtol=1e-6)


def test_oi_pulls_toward_observations():
    lats = np.linspace(-10, 10, 6)
    lons = np.linspace(0, 10, 5)
    oi = OptimalInterpolation(lats, lons, sigma_b=1.0, sigma_o=0.1,
                              length_scale_m=300_000.0)
    g = 30
    fc = np.zeros((g, 2), np.float32)
    obs = np.full((g, 2), np.nan, np.float32)
    obs[12, 0] = 1.0
    out = oi.apply(fc, obs)
    # Observed node strongly corrected (obs trusted: sigma_o << sigma_b).
    assert out[12, 0] > 0.8
    # Neighbors corrected less, but positively.
    assert 0 < out[13, 0] < out[12, 0]
    # Untouched channel unchanged.
    np.testing.assert_allclose(out[:, 1], 0.0, atol=1e-7)
    # Far nodes barely affected.
    assert abs(out[0, 0]) < out[12, 0] / 2


def test_oi_roi_mode_matches_restriction():
    lats = np.linspace(-10, 10, 6)
    lons = np.linspace(0, 10, 5)
    roi = np.arange(10, 20)
    oi = OptimalInterpolation(lats, lons, 1.0, 0.1, 300_000.0, roi_idx=roi)
    fc = np.zeros((30, 1), np.float32)
    obs = np.full((30, 1), np.nan, np.float32)
    obs[12, 0] = 1.0
    out = oi.apply(fc, obs)
    # Only ROI nodes may change.
    outside = np.setdiff1d(np.arange(30), roi)
    np.testing.assert_allclose(out[outside, 0], 0.0, atol=1e-9)
    assert out[12, 0] > 0.8
