"""Tests for the U-Net family and the grid-image adapter path
(CNN models trained/evaluated through the SAME engine as the GNNs)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from graphcast_lite_tpu.models.unet import (
    DownscalerUNet,
    WeatherUNet,
    WeatherUNetV2,
    upsample_align_corners,
)
from graphcast_lite_tpu.models.grid_adapter import GridImageModel
from graphcast_lite_tpu.training.loss import gradient_loss, spectral_loss


def test_upsample_align_corners_matches_torch_semantics():
    # Linear ramp: endpoints preserved, interior linear.
    x = jnp.arange(4.0).reshape(1, 4, 1, 1) * jnp.ones((1, 4, 3, 1))
    out = upsample_align_corners(x, (7, 5))
    np.testing.assert_allclose(out[0, 0, :, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[0, -1, :, 0], 3.0, atol=1e-6)
    np.testing.assert_allclose(
        out[0, :, 0, 0], np.linspace(0, 3, 7), atol=1e-6
    )


@pytest.mark.parametrize("cls,kw", [
    (WeatherUNet, dict(out_channels=5, base_filters=8)),
    (WeatherUNetV2, dict(out_channels=5, base_filters=8)),
    (DownscalerUNet, dict(out_channels=5, base_filters=8)),
])
def test_unet_shapes(cls, kw):
    model = cls(**kw)
    x = jnp.ones((2, 24, 16, 10))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 24, 16, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_odd_sizes():
    """Reference operates on 61x41 grids — odd sizes must round-trip."""
    model = WeatherUNet(out_channels=3, base_filters=8)
    x = jnp.ones((1, 41, 61, 6))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 41, 61, 3)


def test_extra_losses():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
    assert float(spectral_loss(a, a)) == 0.0
    assert float(gradient_loss(a, a)) == 0.0
    # Zeroed prediction loses all spectral energy -> large loss.
    assert float(spectral_loss(a, 0 * a)) > 0.1
    # Smoothing raises the gradient loss more than a tiny perturbation.
    smooth = jnp.asarray(
        0.25 * (np.asarray(a) + np.roll(np.asarray(a), 1, 1)
                + np.roll(np.asarray(a), 1, 2)
                + np.roll(np.roll(np.asarray(a), 1, 1), 1, 2))
    )
    assert float(gradient_loss(a, smooth)) > float(
        gradient_loss(a, a + 1e-3)
    )


def test_unet_through_shared_trainer(tmp_path):
    """Train a U-Net via the SAME Trainer/rollout as the GNN models."""
    from graphcast_lite_tpu.config import DataConfig, ExperimentConfig
    from graphcast_lite_tpu.data.dataset import load_chunked_datasets
    from graphcast_lite_tpu.data.synthetic import generate_synthetic_dataset
    from graphcast_lite_tpu.training.trainer import Trainer

    data_dir = str(tmp_path / "data")
    generate_synthetic_dataset(data_dir, n_time=24, n_lon=16, n_lat=8,
                               n_feat=4)
    train_ds, val_ds, _, meta = load_chunked_datasets(
        data_dir, obs_window=2, pred_steps=2, n_features=4
    )
    cfg = ExperimentConfig(
        batch_size=2, learning_rate=1e-3, num_epochs=4, max_ar_steps=2,
        data=DataConfig(dataset_name="synthetic", num_features_used=4,
                        obs_window_used=2, pred_window_used=2,
                        want_feats_flattened=True),
    )
    model = GridImageModel(
        image_module=WeatherUNet(out_channels=4, base_filters=8),
        n_lat=8, n_lon=16,
    )
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.cosine_decay_schedule(1e-3, 200)),
    )
    trainer = Trainer(model, None, cfg, meta, str(tmp_path / "results"),
                      optimizer=opt)
    state = trainer.init_state(seed=0)
    results = trainer.fit(state, train_ds, val_ds, print_losses=False)
    # val loss is the stable signal: train loss jumps at AR-curriculum bumps.
    assert results["val_losses"][-1] < results["val_losses"][0]

    # And evaluate through the shared inference engine.
    from graphcast_lite_tpu.inference.predict import evaluate_model

    report = evaluate_model(
        model, trainer.final_state.params, None, val_ds, meta, ar_steps=2,
        max_samples=2,
    )
    assert np.isfinite(report.rmse)
