"""bf16-vs-fp32 training quality study + TPU-trained artifact
(VERDICT r3 tasks 4 & 5).

Builds a flagship-class 64x32/33f experiment on synthetic data (mesh
[3, 5], hidden 256, 12 MP steps — the kernel-gate configuration), trains it
TWICE on the real TPU (tpu.compute_dtype = float32 vs bfloat16), and
evaluates both with cli.predict.  Emits a side-by-side table
(RESULTS.md "bf16 quality study" + "TPU-trained" sections are written from
this output).

Usage: python scripts/quality_study.py BASE_DIR [--epochs 20] [--mp 12]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_experiment(base: str, name: str, compute_dtype: str, epochs: int,
                     mp_steps: int, data_dir: str):
    from graphcast_lite_tpu.config import (
        DataConfig, ExperimentConfig, GraphBlock, GraphBuildingConfig,
        GraphLayerType, Grid2MeshEdgeCreation, Mesh2GridEdgeCreation,
        MLPBlock, ModelConfig, PipelineConfig, TpuConfig,
    )

    n_feat, hidden = 33, 256
    cfg = ExperimentConfig(
        batch_size=1,
        learning_rate=1e-3,
        num_epochs=epochs,
        max_ar_steps=4,
        early_stopping_patience=epochs,
        static_channels=[n_feat - 2],
        forcing_channels=[n_feat - 1],
        data_dir=data_dir,
        graph=GraphBuildingConfig(
            grid2mesh_edge_creation=Grid2MeshEdgeCreation.RADIUS,
            grid2mesh_radius_query=0.6,
            mesh_levels=[3, 5],
            mesh2grid_edge_creation=Mesh2GridEdgeCreation.CONTAINED,
        ),
        pipeline=PipelineConfig(
            encoder=ModelConfig(
                mlp=MLPBlock(mlp_hidden_dims=[hidden], output_dim=hidden,
                             use_layer_norm=True, layer_norm_mode="node"),
                gcn=GraphBlock(layer_type=GraphLayerType.ConvGCN,
                               hidden_dims=[hidden], output_dim=hidden,
                               use_layer_norm=False),
            ),
            processor=ModelConfig(gcn=GraphBlock(
                layer_type=GraphLayerType.InteractionNet, output_dim=hidden,
                num_message_passing_steps=mp_steps, edge_feature_dim=4,
                activation="swish", use_layer_norm=True,
            )),
            decoder=ModelConfig(
                mlp=MLPBlock(mlp_hidden_dims=[hidden], output_dim=hidden,
                             use_layer_norm=False),
                gcn=GraphBlock(layer_type=GraphLayerType.ConvGCN,
                               hidden_dims=[hidden], output_dim=n_feat,
                               use_layer_norm=False),
            ),
        ),
        data=DataConfig(
            dataset_name="synthetic_64x32_33f",
            num_features_used=n_feat,
            obs_window_used=2,
            pred_window_used=4,
            want_feats_flattened=True,
        ),
        tpu=TpuConfig(compute_dtype=compute_dtype),
        use_residual=True,
    )
    exp = os.path.join(base, name)
    os.makedirs(exp, exist_ok=True)
    with open(os.path.join(exp, "config.json"), "w") as f:
        f.write(cfg.model_dump_json(indent=1))
    return exp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("base_dir")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--mp", type=int, default=12)
    ap.add_argument("--only", choices=["fp32", "bf16"], default=None)
    args = ap.parse_args()

    from graphcast_lite_tpu.cli import predict as predict_cli
    from graphcast_lite_tpu.cli import train as train_cli
    from graphcast_lite_tpu.data.synthetic import generate_synthetic_dataset

    os.makedirs(args.base_dir, exist_ok=True)
    data_dir = os.path.join(args.base_dir, "data")
    if not os.path.exists(os.path.join(data_dir, "dataset_info.json")):
        generate_synthetic_dataset(
            data_dir, n_time=120, n_lon=64, n_lat=32, n_feat=33,
            static_channels=[31], forcing_channels=[32], seed=7,
        )
        print("[quality_study] dataset ready")

    results = {}
    for name, dtype in (("fp32", "float32"), ("bf16", "bfloat16")):
        if args.only and name != args.only:
            continue
        exp = build_experiment(args.base_dir, name, dtype, args.epochs,
                               args.mp, data_dir)
        t0 = time.time()
        train_cli.main([exp])
        train_s = time.time() - t0
        rep_path = os.path.join(exp, "predict_report.json")
        predict_cli.main([exp, "--ar-steps", "4", "--per-channel",
                          "--report-json", rep_path])
        with open(rep_path) as f:
            rep = json.load(f)
        with open(os.path.join(exp, "results.json")) as f:
            hist = json.load(f)
        results[name] = {
            "compute_dtype": dtype,
            "train_s": round(train_s, 1),
            "final_val_loss": hist["val_losses"][-1],
            "best_val_loss": min(hist["val_losses"]),
            "skill_pct": round(rep["skill"] * 100, 2),
            "rmse": rep["rmse"],
            "acc": rep["acc"],
            "per_horizon_skill": [round(h["skill"] * 100, 2)
                                  for h in rep["per_horizon"]],
        }
        print(f"[quality_study] {name}: {json.dumps(results[name])}")

    out = os.path.join(args.base_dir, "quality_study.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"[quality_study] wrote {out}")
    if len(results) == 2:
        a, b = results["fp32"], results["bf16"]
        print(f"Δ skill (bf16 − fp32): {b['skill_pct'] - a['skill_pct']:+.2f} pp")
        print(f"Δ val loss: {b['best_val_loss'] - a['best_val_loss']:+.6f}")


if __name__ == "__main__":
    main()
