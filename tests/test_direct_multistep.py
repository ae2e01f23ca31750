"""Direct multi-step (P·C decode) model support (VERDICT r4 Missing #3):
reference configs like wb2_64x32_15f_4pred decode all P steps in ONE
forward; the reference's DA rollout auto-detects them ("ВАРИАНТ А",
src/assimilation/nudging.py:102-193).  Covered here:

* config detection (``build.config_direct_steps``) incl. the actual
  reference 4pred config.json;
* end-to-end training (loss decreases; eval runs) through the Trainer;
* evaluation semantics: residual per step vs the last observed frame,
  static/forcing carry-forward on every step;
* offline nudging in direct mode through ``evaluate_model(assimilator=)``.
"""

import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from graphcast_lite_tpu.build import config_direct_steps  # noqa: E402
from graphcast_lite_tpu.config import GraphLayerType  # noqa: E402
from graphcast_lite_tpu.training.rollout import (  # noqa: E402
    RolloutSpec,
    rollout_loss,
    rollout_predict,
)

from tests.test_training import small_experiment  # noqa: E402

P, C = 3, 5


def test_config_direct_steps_detection(tmp_path):
    cfg, *_ = small_experiment(tmp_path, direct_pred=P, max_ar=P, n_feat=C)
    assert config_direct_steps(cfg) == P
    cfg1, *_ = small_experiment(tmp_path / "b", max_ar=2, n_feat=C)
    assert config_direct_steps(cfg1) == 1


def test_reference_4pred_config_detected():
    """The actual reference 4pred config ingests AND reports direct 4."""
    from graphcast_lite_tpu.config import load_experiment_config

    path = "/root/reference/experiments/wb2_64x32_15f_4pred/config.json"
    try:
        with open(path) as f:
            json.load(f)
    except OSError:
        pytest.skip("reference tree unavailable")
    cfg = load_experiment_config(path)
    assert cfg.data.num_features_used == 15
    assert config_direct_steps(cfg) == 4


def _direct_model_fn(g):
    """Toy direct model: delta for step p = (p+1) * mean of the window,
    broadcast — deterministic, shape [G, P*C]."""
    def fn(inp, mask, thr, prune):
        base = inp.mean(axis=-1, keepdims=True)        # [G, 1]
        scale = jnp.arange(1, P + 1, dtype=inp.dtype)  # [P]
        delta = (base[:, None, :] * scale[None, :, None])  # [G, P, 1]
        delta = jnp.broadcast_to(delta, (g, P, C)).reshape(g, P * C)
        return delta * 0.1, None
    return fn


def test_direct_rollout_semantics():
    g = 7
    rng = np.random.RandomState(0)
    window = jnp.asarray(rng.randn(g, 2, C).astype(np.float32))
    targets = jnp.asarray(rng.randn(g, P, C).astype(np.float32))
    spec = RolloutSpec(obs_window=2, num_features=C, use_residual=True,
                       remat=False, static_channels=(3,),
                       forcing_channels=(4,), direct_steps=P)
    fn = _direct_model_fn(g)
    out = rollout_predict(fn, window, P, spec, forcing=targets)
    assert out.shape == (g, P, C)

    # Oracle: replicate _direct_forward by hand.
    delta, _ = fn(np.asarray(window).reshape(g, 2 * C), None, 0.0, False)
    expect = np.asarray(window)[:, -1, :][:, None, :] + np.asarray(
        delta
    ).reshape(g, P, C)
    expect[:, :, 3] = np.asarray(window)[:, -1, 3][:, None]   # static
    expect[:, :, 4] = np.asarray(targets)[:, :, 4]            # forcing
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-6)

    # steps < P slices the head; loss path runs and is finite.
    out2 = rollout_predict(fn, window, 2, spec, forcing=targets)
    np.testing.assert_allclose(np.asarray(out2), expect[:, :2], atol=1e-6)
    loss, _ = rollout_loss(fn, window, targets, P, spec)
    assert np.isfinite(float(loss))


def test_direct_training_and_eval(tmp_path):
    from graphcast_lite_tpu.inference.predict import evaluate_model
    from graphcast_lite_tpu.training.trainer import Trainer

    cfg, model, graphs, train_ds, val_ds, test_ds, meta = small_experiment(
        tmp_path, direct_pred=P, max_ar=P, n_feat=C
    )
    trainer = Trainer(model, graphs, cfg, meta, str(tmp_path / "results"))
    assert trainer.spec.direct_steps == P
    state = trainer.init_state(seed=0)
    results = trainer.fit(state, train_ds, val_ds, print_losses=False,
                          max_steps_per_epoch=3)
    # Curriculum levels re-scale the loss; compare the step-1 val metric,
    # which trainer.evaluate computes identically at every level.
    assert np.isfinite(results["train_losses"]).all()
    assert results["val_losses"][-1] < results["val_losses"][0]

    from graphcast_lite_tpu.training.checkpoint import load_params

    params = load_params(
        str(tmp_path / "results" / "best_model.msgpack"), state.params
    )
    report = evaluate_model(
        model, params, graphs, test_ds, meta, ar_steps=P,
        use_residual=cfg.use_residual,
        static_channels=tuple(cfg.static_channels),
        forcing_channels=tuple(cfg.forcing_channels),
        direct_steps=P,
    )
    assert report.ar_steps == P and report.num_samples > 0
    assert np.isfinite(report.rmse)
    assert len(report.per_horizon) == P


def test_direct_mode_offline_nudging(tmp_path):
    """An assimilator in direct mode is applied per step OFFLINE (reference
    ВАРИАНТ А) and must strictly improve RMSE toward perfect obs."""
    from graphcast_lite_tpu.assimilation.nudging import NudgingAssimilator
    from graphcast_lite_tpu.inference.predict import evaluate_model

    cfg, model, graphs, _, _, test_ds, meta = small_experiment(
        tmp_path, direct_pred=P, max_ar=P, n_feat=C
    )
    import jax as _jax

    g = test_ds.n_nodes
    dummy = np.zeros((g, 2 * C), np.float32)
    params = _jax.jit(model.init)(_jax.random.PRNGKey(0), dummy, graphs)

    def run(assim):
        return evaluate_model(
            model, params, graphs, test_ds, meta, ar_steps=P,
            use_residual=cfg.use_residual,
            static_channels=tuple(cfg.static_channels),
            forcing_channels=tuple(cfg.forcing_channels),
            direct_steps=P, max_samples=3, assimilator=assim,
        )

    base = run(None)

    nudger = NudgingAssimilator(alpha=0.5)
    state = {"i": -1}

    def assim(out, step):
        if step == 0:
            state["i"] += 1
        x, y = test_ds.get(state["i"])
        truth = y.reshape(g, -1, C)[:, step, :]
        return nudger.apply(out, truth)

    nudged = run(assim)
    assert nudged.rmse < base.rmse


def test_direct_forcing_window_shorter_than_p():
    """Forcing/targets windows shorter than direct_steps must not shape-
    crash: out is clipped to `steps` BEFORE the forcing substitution."""
    g = 7
    rng = np.random.RandomState(1)
    window = jnp.asarray(rng.randn(g, 2, C).astype(np.float32))
    targets2 = jnp.asarray(rng.randn(g, 2, C).astype(np.float32))  # 2 < P=3
    spec = RolloutSpec(obs_window=2, num_features=C, use_residual=True,
                       remat=False, forcing_channels=(4,), direct_steps=P)
    fn = _direct_model_fn(g)
    out = rollout_predict(fn, window, 2, spec, forcing=targets2)
    assert out.shape == (g, 2, C)
    np.testing.assert_allclose(
        np.asarray(out)[:, :, 4], np.asarray(targets2)[:, :, 4], atol=1e-6
    )
    loss, _ = rollout_loss(fn, window, targets2, 2, spec)
    assert np.isfinite(float(loss))

    # Requesting MORE steps than a direct model emits is an explicit error.
    with pytest.raises(ValueError, match="direct model emits"):
        rollout_predict(fn, window, P + 2, spec)
