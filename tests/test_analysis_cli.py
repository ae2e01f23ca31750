"""Fixture tests for the analysis surface: comparison figures, the MOS/IDW
parameter sweep, and the one-command experiment evaluator
(~ reference scripts/plot_compare_algos.py, plot_diff.py, plot_triad.py,
mos_idw_sweep.py, eval_real_freeze6.py)."""

import json
import os

import numpy as np
import pytest

from test_training import small_experiment


@pytest.fixture(scope="module")
def eval_exp(tmp_path_factory):
    import jax

    from graphcast_lite_tpu.training import checkpoint as ckpt_lib

    tmp_path = tmp_path_factory.mktemp("analysis")
    cfg, model, graphs, train_ds, val_ds, test_ds, meta = small_experiment(
        tmp_path, max_ar=2
    )
    exp = tmp_path / "exp"
    os.makedirs(exp, exist_ok=True)
    cfg = cfg.model_copy(update={"data_dir": str(tmp_path / "data")})
    with open(exp / "config.json", "w") as f:
        f.write(cfg.model_dump_json(indent=1))
    # random-init params as the "checkpoint" (wiring test, not quality)
    g = meta.num_latitudes * meta.num_longitudes
    dummy = np.zeros((g, cfg.data.obs_window_used *
                      cfg.data.num_features_used), np.float32)
    params = model.init(jax.random.PRNGKey(0), jax.numpy.asarray(dummy),
                        graphs)
    ckpt_lib.save_params(str(exp / "best_model.msgpack"), params)
    return str(exp), str(tmp_path / "data")


def test_eval_experiment_end_to_end(eval_exp):
    from graphcast_lite_tpu.cli import eval_experiment

    exp, data_dir = eval_exp
    written = eval_experiment.main([
        exp, "--data-dir", data_dir, "--ar-steps", "2", "--max-samples", "4",
    ])
    out = os.path.join(exp, "eval")
    assert os.path.exists(os.path.join(out, "report.json"))
    assert os.path.exists(os.path.join(out, "preds.npz"))
    assert os.path.exists(os.path.join(out, "maps_ch0.png"))
    assert os.path.exists(os.path.join(out, "triad_ch0.png"))
    assert os.path.exists(os.path.join(out, "mos_idw_sweep.json"))
    with open(os.path.join(out, "report.json")) as f:
        rep = json.load(f)
    assert np.isfinite(rep["rmse"])
    with open(os.path.join(out, "mos_idw_sweep.json")) as f:
        sweep = json.load(f)
    assert len(sweep["rows"]) >= 4
    assert all(np.isfinite(r["rmse"]) for r in sweep["rows"])
    assert written


def test_plot_compare_cli(eval_exp, tmp_path):
    from graphcast_lite_tpu.cli import plot_compare

    exp, data_dir = eval_exp
    preds = os.path.join(exp, "eval", "preds.npz")
    assert os.path.exists(preds), "run test_eval_experiment first (module order)"
    out = str(tmp_path / "figs")
    paths = plot_compare.main([
        "--data-dir", data_dir, "--out-dir", out,
        "--preds", f"base={preds}", "--preds", f"alt={preds}",
        "--var-idx", "0", "--step-idx", "0",
    ])
    assert len(paths) == 4     # compare / triad / diff / final_trio
    assert any("final_trio" in p for p in paths)
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 1000


def test_mos_idw_sweep_cli(eval_exp):
    from graphcast_lite_tpu.cli import mos_idw_sweep

    exp, data_dir = eval_exp
    preds = os.path.join(exp, "eval", "preds.npz")
    rows = mos_idw_sweep.main([
        "--preds", preds, "--data-dir", data_dir,
        "--sparsity", "0.2", "--calib", "2",
        "--powers", "1,2", "--radii", "300,600",
    ])
    assert len(rows) == 5  # stations-only anchor + 2x2 grid
    assert rows == sorted(rows, key=lambda r: r["rmse"])
    assert os.path.exists(os.path.splitext(preds)[0] + "_mos_idw_sweep.json")
