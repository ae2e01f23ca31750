"""Tests for streaming metrics and the AR evaluation engine."""

import numpy as np
import pytest

from graphcast_lite_tpu.inference.metrics import StreamingMetrics, skill_score
from graphcast_lite_tpu.inference.predict import evaluate_model, region_node_mask
from graphcast_lite_tpu.data.dataset import DatasetMetadata


def test_streaming_metrics_match_batch_computation(rng):
    c = 4
    sm = StreamingMetrics(c, exclude_channels=[3])
    yts, yps = [], []
    for _ in range(5):
        yt = rng.randn(50, c * 2)
        yp = yt + 0.1 * rng.randn(50, c * 2)
        sm.update(yt, yp)
        yts.append(yt)
        yps.append(yp)
    yt = np.concatenate(yts)
    yp = np.concatenate(yps)
    dyn = [i for i in range(c * 2) if i % c != 3]
    expect_rmse = np.sqrt(np.mean((yp[:, dyn] - yt[:, dyn]) ** 2))
    np.testing.assert_allclose(sm.rmse, expect_rmse, rtol=1e-9)
    expect_mae = np.mean(np.abs(yp[:, dyn] - yt[:, dyn]))
    np.testing.assert_allclose(sm.mae, expect_mae, rtol=1e-9)
    # Per-channel RMSE pools both horizons of the channel.
    ch0_cols = [0, c]
    expect_ch0 = np.sqrt(np.mean((yp[:, ch0_cols] - yt[:, ch0_cols]) ** 2))
    np.testing.assert_allclose(sm.rmse_per_channel[0], expect_ch0, rtol=1e-9)
    assert 0.9 < sm.acc <= 1.0


def test_skill_score():
    assert skill_score(0.5, 1.0) == pytest.approx(0.5)
    assert skill_score(1.0, 1.0) == pytest.approx(0.0, abs=1e-9)


def test_region_node_mask_modes():
    lats = np.array([0.0, 10.0, 20.0], np.float32)
    lons = np.array([0.0, 90.0], np.float32)
    meta = DatasetMetadata(
        flattened=True, num_latitudes=3, num_longitudes=2, num_features=1,
        obs_window=1, pred_window=1, coordinates=(lats, lons),
    )
    m = region_node_mask(meta, region=(5.0, 15.0, 0.0, 45.0))
    # lat-major: nodes = [(0,0),(0,90),(10,0),(10,90),(20,0),(20,90)]
    np.testing.assert_array_equal(
        m, [False, False, True, False, False, False]
    )
    m2 = region_node_mask(meta, boundary_width=1)
    assert m2.sum() == 0  # 3x2 grid has no interior at width 1
    flat_meta = DatasetMetadata(
        flattened=True, num_latitudes=0, num_longitudes=0, num_features=1,
        obs_window=1, pred_window=1, flat_grid=True,
        is_regional=np.array([True, False, True]),
    )
    np.testing.assert_array_equal(
        region_node_mask(flat_meta), [True, False, True]
    )


def test_evaluate_model_end_to_end(tmp_path):
    from tests.test_training import small_experiment
    from graphcast_lite_tpu.training.trainer import Trainer

    cfg, model, graphs, train_ds, val_ds, test_ds, meta = small_experiment(
        tmp_path, max_ar=2
    )
    trainer = Trainer(model, graphs, cfg, meta, str(tmp_path / "results"))
    state = trainer.init_state(seed=0)
    # quick train so skill is meaningful-ish
    cfg2 = cfg.model_copy(update={"num_epochs": 2})
    trainer.config = cfg2
    trainer.fit(state, train_ds, val_ds, print_losses=False,
                max_steps_per_epoch=4)

    scalers = np.load(str(tmp_path / "data" / "scalers.npz"))
    report = evaluate_model(
        model, trainer.final_state.params, graphs, test_ds, meta,
        ar_steps=2, static_channels=(3,), forcing_channels=(4,),
        scalers_std=scalers["std"],
        save_predictions=str(tmp_path / "preds.npz"),
        region=(-60.0, 60.0, 0.0, 180.0),
    )
    assert report.num_samples == len(test_ds)
    assert np.isfinite(report.rmse) and np.isfinite(report.skill)
    assert len(report.per_horizon) == 2
    assert report.region is not None and report.region["num_nodes"] > 0
    assert report.per_channel_rmse_physical is not None
    text = report.summary()
    assert "Skill" in text and "region" in text

    saved = np.load(str(tmp_path / "preds.npz"))
    assert saved["predictions"].shape == (len(test_ds), 128, 2 * 5)
    assert saved["ground_truth"].shape == saved["predictions"].shape


def test_evaluate_with_nudging_improves_rmse(tmp_path):
    """Assimilating the ground truth as dense obs must reduce RMSE."""
    from tests.test_training import small_experiment
    from graphcast_lite_tpu.assimilation.nudging import NudgingAssimilator

    cfg, model, graphs, train_ds, val_ds, test_ds, meta = small_experiment(
        tmp_path, max_ar=2
    )
    import jax
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((model.num_grid_nodes, 10), np.float32), graphs,
    )

    base = evaluate_model(
        model, params, graphs, test_ds, meta, ar_steps=2, max_samples=3,
        static_channels=(3,), forcing_channels=(4,),
    )

    def make_assim(i):
        x, y = test_ds.get(i)
        obs = y.reshape(-1, 2, 5).copy()
        return NudgingAssimilator(alpha=0.9).make_step_hook(obs)

    # evaluate_model takes one hook; emulate per-sample obs via closure index.
    counter = {"i": 0, "hook": None}

    def assim(state, step):
        if step == 0 and counter["hook"] is None or step == 0:
            counter["hook"] = make_assim(counter["i"])
            if step == 0:
                pass
        out = counter["hook"](state, step)
        if step == 1:
            counter["i"] += 1
            counter["hook"] = None
        return out

    da = evaluate_model(
        model, params, graphs, test_ds, meta, ar_steps=2, max_samples=3,
        static_channels=(3,), forcing_channels=(4,), assimilator=assim,
    )
    assert da.rmse < base.rmse


def test_single_dispatch_matches_per_step_path(tmp_path):
    """The whole-trajectory single-dispatch rollout (assimilator=None) must
    produce metrics identical to the per-step dispatch path (VERDICT r4
    task 3).  We force the per-step path with an identity assimilator."""
    import numpy as np

    from tests.test_training import small_experiment
    from graphcast_lite_tpu.inference.predict import evaluate_model

    cfg, model, graphs, _, _, test_ds, meta = small_experiment(tmp_path)
    import jax

    g = test_ds.n_nodes
    dummy = np.zeros((g, 2 * 5), np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, graphs)

    kw = dict(
        ar_steps=2, use_residual=cfg.use_residual,
        static_channels=tuple(cfg.static_channels),
        forcing_channels=tuple(cfg.forcing_channels), max_samples=4,
    )
    single = evaluate_model(model, params, graphs, test_ds, meta, **kw)
    per_step = evaluate_model(
        model, params, graphs, test_ds, meta,
        assimilator=lambda out, step: out,  # identity -> forces per-step
        **kw,
    )
    np.testing.assert_allclose(single.rmse, per_step.rmse, rtol=1e-6)
    np.testing.assert_allclose(single.acc, per_step.acc, rtol=1e-6)
    np.testing.assert_allclose(
        single.per_channel_rmse, per_step.per_channel_rmse, rtol=1e-6
    )
    for a, b in zip(single.per_horizon, per_step.per_horizon):
        np.testing.assert_allclose(a["rmse"], b["rmse"], rtol=1e-6)


def test_amortized_serve_matches_single(tmp_path):
    """rollouts_per_dispatch=K batches K trajectories per dispatch with
    identical metrics (the bench's amortized-serve program, now exposed
    through evaluate_model / cli.predict)."""
    import numpy as np

    from tests.test_training import small_experiment
    from graphcast_lite_tpu.inference.predict import evaluate_model

    cfg, model, graphs, _, _, test_ds, meta = small_experiment(tmp_path)
    import jax

    g = test_ds.n_nodes
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((g, 10), np.float32), graphs
    )
    kw = dict(
        ar_steps=2, use_residual=cfg.use_residual,
        static_channels=tuple(cfg.static_channels),
        forcing_channels=tuple(cfg.forcing_channels), max_samples=5,
    )
    single = evaluate_model(model, params, graphs, test_ds, meta, **kw)
    # K=3 over 5 samples: one full chunk + one partial (recompile) chunk.
    amort = evaluate_model(model, params, graphs, test_ds, meta,
                           rollouts_per_dispatch=3, **kw)
    np.testing.assert_allclose(single.rmse, amort.rmse, rtol=1e-6)
    np.testing.assert_allclose(single.acc, amort.acc, rtol=1e-6)
    np.testing.assert_allclose(
        single.per_channel_rmse, amort.per_channel_rmse, rtol=1e-6
    )
