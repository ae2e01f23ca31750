"""The full-pipeline ladder evaluator must produce ≥6 rungs (VERDICT r1
item 6: raw / +nudging / +oi / +lapse / +mos / +idw / stacked, plus the
optional cascade rung), all with finite metrics, on synthetic data.
"""

import json
import os

import jax
import numpy as np
import pytest

from test_training import small_experiment

from graphcast_lite_tpu.cli import evaluate_pipeline


@pytest.fixture(scope="module")
def exp_dir(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("ladder")
    cfg, model, graphs, train_ds, val_ds, test_ds, meta = small_experiment(
        tmp_path, max_ar=2
    )
    exp = tmp_path / "exp"
    os.makedirs(exp, exist_ok=True)
    cfg = cfg.model_copy(update={"data_dir": str(tmp_path / "data")})
    with open(exp / "config.json", "w") as f:
        f.write(cfg.model_dump_json(indent=1))
    return str(exp), str(tmp_path / "data"), cfg, meta


def test_ladder_has_all_rungs(exp_dir, capsys):
    exp, data_dir, cfg, meta = exp_dir
    evaluate_pipeline.main([
        exp, "--data-dir", data_dir, "--ar-steps", "2",
        "--max-samples", "3", "--mos-calibration", "2",
        "--t2m-channel", "0", "--zsurf-channel", "3",
    ])
    with open(os.path.join(exp, "pipeline_eval.json")) as f:
        results = json.load(f)
    expected = {"raw", "+nudging", "+oi", "+lapse", "+mos", "+idw",
                "+lapse+mos+idw"}
    assert expected <= set(results), sorted(results)
    for name, r in results.items():
        assert np.isfinite(r["rmse"]), name
        assert np.isfinite(r["skill"]), name
    # DA rungs feed truth back in; they must not be WORSE than raw by much
    assert results["+nudging"]["rmse"] <= results["raw"]["rmse"] * 1.05
    out = capsys.readouterr().out
    assert "Δ vs raw" in out


def test_ladder_cascade_rung(exp_dir):
    """--unet-exp adds the cascade rungs (wiring test with a freshly
    initialized downscaler)."""
    from flax import serialization

    from graphcast_lite_tpu.models.unet import DownscalerUNet

    exp, data_dir, cfg, meta = exp_dir
    c = cfg.data.num_features_used
    unet_dir = os.path.join(exp, "unet")
    os.makedirs(unet_dir, exist_ok=True)
    unet = DownscalerUNet(out_channels=c, base_filters=8)
    uparams = unet.init(
        jax.random.PRNGKey(0),
        np.zeros((1, meta.num_latitudes, meta.num_longitudes, c), np.float32),
    )
    with open(os.path.join(unet_dir, "best_model.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(uparams))
    with open(os.path.join(unet_dir, "config.json"), "w") as f:
        json.dump({"base_filters": 8, "num_features": c}, f)

    evaluate_pipeline.main([
        exp, "--data-dir", data_dir, "--ar-steps", "1",
        "--max-samples", "2", "--mos-calibration", "1",
        "--unet-exp", unet_dir, "--zsurf-channel", "-1",
    ])
    with open(os.path.join(exp, "pipeline_eval.json")) as f:
        results = json.load(f)
    assert "+cascade" in results
    assert "+cascade+lapse+mos+idw" in results
    assert np.isfinite(results["+cascade"]["rmse"])


@pytest.fixture(scope="module")
def drift_exp_dir(tmp_path_factory):
    """Experiment over a dataset with a PLANTED test-period regime shift:
    surface elevation accrues +120 m/step under a smooth blob, t2m cools by
    the lapse rate, z_surf (a forcing channel, substituted from truth
    during the rollout) carries the geopotential.  Any stationary model
    systematically misses the per-step increment, so the MOS / IDW / lapse
    rungs have real, known structure to remove (VERDICT r3 item 8: the
    demo-scale ladder's post-processing rungs were quality no-ops)."""
    from graphcast_lite_tpu.data.synthetic import generate_synthetic_dataset
    from test_training import small_experiment

    tmp_path = tmp_path_factory.mktemp("ladder_drift")
    cfg, model, graphs, train_ds, val_ds, test_ds, meta = small_experiment(
        tmp_path, max_ar=2
    )
    # regenerate the dataset WITH the planted drift (same shape/channels)
    data_dir = str(tmp_path / "data")
    generate_synthetic_dataset(
        data_dir, n_time=30, n_lon=16, n_lat=8, n_feat=5,
        static_channels=[3], forcing_channels=[4],
        regime_drift_m_per_step=120.0,
        drift_t2m_channel=0, drift_zsurf_channel=4,
    )
    exp = tmp_path / "exp"
    os.makedirs(exp, exist_ok=True)
    cfg = cfg.model_copy(update={"data_dir": data_dir})
    with open(exp / "config.json", "w") as f:
        f.write(cfg.model_dump_json(indent=1))
    return str(exp), data_dir


def test_ladder_rungs_remove_planted_bias(drift_exp_dir):
    exp, data_dir = drift_exp_dir
    evaluate_pipeline.main([
        exp, "--data-dir", data_dir, "--ar-steps", "2",
        "--max-samples", "3", "--mos-calibration", "1",
        "--obs-sparsity", "0.2",
        "--t2m-channel", "0", "--zsurf-channel", "4",
    ])
    with open(os.path.join(exp, "pipeline_eval.json")) as f:
        res = json.load(f)
    raw = res["raw"]["rmse"]
    # Every post-processing rung must measurably REMOVE the planted bias.
    assert res["+lapse"]["rmse"] < raw, (res["+lapse"]["rmse"], raw)
    assert res["+mos"]["rmse"] < raw, (res["+mos"]["rmse"], raw)
    assert res["+idw"]["rmse"] < raw, (res["+idw"]["rmse"], raw)
    assert res["+lapse+mos+idw"]["rmse"] < raw
    # IDW spreads the (smooth) station bias to every node: at least as good
    # as correcting the stations alone.
    assert res["+idw"]["rmse"] <= res["+mos"]["rmse"] * 1.01
