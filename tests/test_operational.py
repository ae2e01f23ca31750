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
