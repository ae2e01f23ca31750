"""Downscaler (coarse→fine) training CLI.

~ reference ``scripts/train_downscaler.py``: learn the 0.7°→0.25°
refinement from (bilinearly upsampled coarse, fine truth) pairs built by
``data.etl.build_downscaler_dataset``.  Residual learning maps exactly onto
the shared engine: with obs_window=1 and use_residual the model output is
``coarse_upsampled + delta`` — the cascade refinement.

Options mirror the reference: ``--gnn-input`` trains on frozen-GNN
predictions instead of truth-derived coarse fields (the gnn_pred.npy
memmaps from ``cli.generate_predictions``, closing the train/inference
domain gap), ``--spectral-weight`` / ``--gradient-weight`` add the FFT and
Sobel sharpness losses.

Usage:
  python -m graphcast_lite_tpu.cli.train_downscaler <out_dir> \\
      --data-dir <downscaler_dataset> [--gnn-input gnn_pred.npy] ...
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("out_dir")
    parser.add_argument("--data-dir", required=True,
                        help="dir from build_downscaler_dataset "
                        "(X_coarse.npy / Y_fine.npy)")
    parser.add_argument(
        "--config", default=None,
        help="reference-style flat downscaler config.json (the schema "
        "scripts/train_downscaler.py reads); fields become defaults",
    )
    parser.add_argument("--gnn-input", default=None,
                        help="optional gnn_pred.npy to use as inputs")
    parser.add_argument("--base-filters", type=int, default=48)
    parser.add_argument("--epochs", type=int, default=60)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--spectral-weight", type=float, default=0.0)
    parser.add_argument("--gradient-weight", type=float, default=0.0)
    parser.add_argument("--test-fraction", type=float, default=0.2)
    parser.add_argument("--batch-size", type=int, default=2)
    parser.add_argument("--max-steps-per-epoch", type=int, default=None)
    args = parser.parse_args(argv)

    if args.config:
        from ..config import load_experiment_config

        gc = load_experiment_config(args.config)
        if not hasattr(gc, "base_filters"):
            parser.error(f"{args.config} is a GNN experiment config")
        args.base_filters = gc.base_filters
        args.epochs = gc.num_epochs
        args.lr = gc.learning_rate
        args.spectral_weight = gc.spectral_weight
        args.gradient_weight = gc.gradient_weight
        args.batch_size = gc.batch_size

    import optax

    from ..config import DataConfig, ExperimentConfig
    from ..data.dataset import DatasetMetadata
    from ..data.legacy_pt import ArrayDataset
    from ..models.grid_adapter import GridImageModel
    from ..models.unet import DownscalerUNet
    from ..training.loss import gradient_loss, spectral_loss
    from ..training.trainer import Trainer

    with open(os.path.join(args.data_dir, "dataset_info.json")) as f:
        info = json.load(f)
    t, h, w, c = info["n_time"], info["n_lat"], info["n_lon"], info["n_feat"]
    x = np.memmap(os.path.join(args.data_dir, "X_coarse.npy"), np.float16,
                  "r", shape=(t, h, w, c))
    y = np.memmap(os.path.join(args.data_dir, "Y_fine.npy"), np.float16,
                  "r", shape=(t, h, w, c))
    x = np.asarray(x, np.float32)
    y = np.asarray(y, np.float32)
    if args.gnn_input:
        meta_path = args.gnn_input + ".json"
        with open(meta_path) as f:
            gmeta = json.load(f)
        gp = np.memmap(args.gnn_input, np.float16, "r",
                       shape=(gmeta["n_samples"], gmeta["n_nodes"],
                              gmeta["n_feat"]))
        n = min(len(gp), t)
        x = np.asarray(gp[:n], np.float32).reshape(n, h, w, c)
        y = y[:n]
        t = n
        print(f"[downscaler] training on frozen-GNN inputs ({n} samples)")

    # Normalize with the fine grid's scalers.
    scl = np.load(os.path.join(args.data_dir, "scalers.npz"))
    mean, std = scl["mean"][:c], scl["std"][:c]
    x = (x - mean) / std
    y = (y - mean) / std

    g = h * w
    xs = x.reshape(t, g, c)
    ys = y.reshape(t, g, c)
    split = int(t * (1 - args.test_fraction))
    n_val = max((t - split) // 2, 1)
    train_ds = ArrayDataset(xs[:split], ys[:split], 1, c)
    val_ds = ArrayDataset(xs[split:split + n_val], ys[split:split + n_val],
                          1, c)

    coords = np.load(os.path.join(args.data_dir, "coords.npz"))
    meta = DatasetMetadata(
        flattened=True, num_latitudes=h, num_longitudes=w, num_features=c,
        obs_window=1, pred_window=1, num_grid_nodes=g,
        coordinates=(coords["latitude"], coords["longitude"]),
    )
    cfg = ExperimentConfig(
        batch_size=args.batch_size, learning_rate=args.lr,
        num_epochs=args.epochs, max_ar_steps=1,
        static_channels=info.get("static_channels", []),
        data=DataConfig(dataset_name="downscaler", num_features_used=c,
                        obs_window_used=1, pred_window_used=1,
                        want_feats_flattened=True),
        data_dir=args.data_dir,
    )
    model = GridImageModel(
        image_module=DownscalerUNet(out_channels=c,
                                    base_filters=args.base_filters),
        n_lat=h, n_lon=w,
    )
    steps = max(split // args.batch_size, 1)
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.cosine_decay_schedule(args.lr,
                                                args.epochs * steps)),
    )
    extra = None
    if args.spectral_weight > 0 or args.gradient_weight > 0:
        sw, gw = args.spectral_weight, args.gradient_weight

        def extra(out, target):
            io = out.reshape(out.shape[:-2] + (h, w, c))
            it = target.reshape(target.shape[:-2] + (h, w, c))
            loss = 0.0
            if sw > 0:
                loss = loss + sw * spectral_loss(io, it)
            if gw > 0:
                loss = loss + gw * gradient_loss(io, it)
            return loss

    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "config.json"), "w") as f:
        f.write(cfg.model_dump_json(indent=1))
    trainer = Trainer(model, None, cfg, meta, args.out_dir, optimizer=opt,
                      extra_loss_fn=extra)
    state = trainer.init_state(seed=cfg.random_seed)
    trainer.fit(state, train_ds, val_ds,
                max_steps_per_epoch=args.max_steps_per_epoch)

    # Skill vs the bilinear-coarse baseline (reference's headline metric).
    base_rmse = float(np.sqrt(np.mean(
        (xs[split:split + n_val] - ys[split:split + n_val]) ** 2
    )))
    import jax

    @jax.jit
    def predict(params, xb):
        delta, _ = model.apply(params, xb)
        return xb + delta

    errs = []
    for i in range(len(val_ds)):
        xv, yv = val_ds.get(i)
        pred = np.asarray(predict(trainer.final_state.params, xv))
        errs.append(np.mean((pred - yv) ** 2))
    rmse = float(np.sqrt(np.mean(errs)))
    skill = 1 - rmse / (base_rmse + 1e-12)
    print(f"[downscaler] val RMSE {rmse:.4f} vs bilinear {base_rmse:.4f} "
          f"-> skill {skill * 100:.1f}%")


if __name__ == "__main__":
    main()
