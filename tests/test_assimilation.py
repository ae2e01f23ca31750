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


def test_oi_roi_b_matrix_scale():
    """OI at 512x256 ROI scale (VERDICT r2 item 9): with an ROI of ~2.5K
    nodes the background covariance must allocate O(|ROI|^2), NOT O(N^2) —
    the reference hit a documented 68 GB B-matrix OOM on the full 131072-node
    grid (reference DA_EXPERIMENTS_GLOBAL_RESULTS.md:11-14); the ROI
    restriction is the fix this framework ships."""
    from graphcast_lite_tpu.assimilation.optimal_interpolation import (
        OptimalInterpolation,
    )

    lats = np.linspace(-89.6484375, 89.6484375, 256).astype(np.float32)
    lons = np.arange(0.0, 360.0, 0.703125).astype(np.float32)
    n = lats.size * lons.size
    assert n == 131072

    # ~2.5K-node regional ROI (a mid-latitude lat/lon box).
    lat2d, lon2d = np.meshgrid(lats, lons, indexing="ij")
    flat_lat, flat_lon = lat2d.reshape(-1), lon2d.reshape(-1)
    roi_idx = np.flatnonzero(
        (flat_lat >= 40) & (flat_lat <= 65) & (flat_lon >= 60)
        & (flat_lon <= 110)
    )
    assert 2000 <= roi_idx.size <= 3000, roi_idx.size

    oi = OptimalInterpolation(
        lats, lons, sigma_b=1.0, sigma_o=0.5, length_scale_m=500e3,
        roi_idx=roi_idx,
    )
    # B is |ROI|^2 (f64: ~50 MB here), not N^2 (~137 GB — the OOM).
    assert oi.B.shape == (roi_idx.size, roi_idx.size)
    assert oi.B.nbytes < 100e6

    # And the analysis touches only ROI rows.
    fc = np.zeros((n, 1), np.float32)
    obs = np.full((n, 1), np.nan, np.float32)
    obs[roi_idx[::50], 0] = 1.0
    out = oi.apply(fc, obs)
    changed = np.flatnonzero(np.abs(out[:, 0]) > 1e-12)
    assert np.isin(changed, roi_idx).all()
    assert changed.size > 0


def test_oi_grouped_channels_match_per_channel_solve():
    """Channels sharing an observation pattern are solved in one stacked
    RHS; the result must equal solving each channel independently, and
    mixed patterns (per-channel station subsets) must group correctly."""
    rng = np.random.RandomState(0)
    lats = np.linspace(-10, 10, 6)
    lons = np.linspace(0, 10, 5)
    oi = OptimalInterpolation(lats, lons, 1.0, 0.3, 400_000.0)
    g, c = 30, 5
    fc = rng.randn(g, c).astype(np.float32)
    obs = np.full((g, c), np.nan, np.float32)
    # Channels 0,1,2 observed at one station set, 3 at another, 4 unobserved.
    obs[[3, 11, 22], 0:3] = rng.randn(3, 3)
    obs[[5, 17], 3] = rng.randn(2)

    out = oi.apply(fc, obs)

    # Oracle: per-channel independent solves.
    expect = fc.astype(np.float64).copy()
    for ch in range(c):
        m = ~np.isnan(obs[:, ch])
        if not m.any():
            continue
        nodes = np.flatnonzero(m)
        expect[:, ch] = oi._analyze(
            fc[:, ch].astype(np.float64), obs[m, ch], nodes
        )
    np.testing.assert_allclose(out, expect.astype(np.float32), atol=1e-5)
    # Unobserved channel untouched.
    np.testing.assert_allclose(out[:, 4], fc[:, 4], atol=1e-7)
