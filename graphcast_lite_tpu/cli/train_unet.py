"""U-Net training CLI (CNN regional stack / downscaler).

~ reference ``src/unet/main.py`` (WeatherUNet: AdamW + cosine LR + grad
clip 1.0, curriculum AR) and ``src/unet/main_v2.py`` (WeatherUNetV2:
OneCycle LR + spectral-FFT and Sobel-gradient loss terms) — both ride the
SHARED Trainer/rollout/inference engine through ``GridImageModel``.

Usage:
  python -m graphcast_lite_tpu.cli.train_unet <out_dir> --data-dir D \\
      [--arch v1|v2] [--base-filters 64] [--epochs 40] [--max-ar 2] \\
      [--spectral-weight 0.05] [--gradient-weight 0.05]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("out_dir")
    parser.add_argument("--data-dir", default=None)
    parser.add_argument(
        "--config", default=None,
        help="reference-style flat U-Net config.json (src/unet/main.py "
        "schema); its fields become the defaults below",
    )
    parser.add_argument("--arch", choices=["v1", "v2"], default="v1")
    parser.add_argument("--base-filters", type=int, default=64)
    parser.add_argument("--obs-window", type=int, default=2)
    parser.add_argument("--max-ar", type=int, default=2)
    parser.add_argument("--n-features", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=40)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--spectral-weight", type=float, default=0.0)
    parser.add_argument("--gradient-weight", type=float, default=0.0)
    parser.add_argument("--static-channels", type=int, nargs="*", default=[])
    parser.add_argument("--forcing-channels", type=int, nargs="*", default=[])
    parser.add_argument("--batch-size", type=int, default=2)
    parser.add_argument("--max-steps-per-epoch", type=int, default=None)
    args = parser.parse_args(argv)

    if args.config:
        from ..config import load_experiment_config

        gc = load_experiment_config(args.config)
        if not hasattr(gc, "base_filters"):
            parser.error(f"{args.config} is a GNN experiment config; "
                         "use cli.train for it")
        args.data_dir = args.data_dir or gc.data_dir
        args.base_filters = gc.base_filters
        args.obs_window = gc.obs_window
        args.max_ar = gc.max_ar_steps
        args.n_features = gc.num_features
        args.epochs = gc.num_epochs
        args.lr = gc.learning_rate
        args.spectral_weight = gc.spectral_weight
        args.gradient_weight = gc.gradient_weight
        args.static_channels = gc.static_channels
        args.forcing_channels = gc.forcing_channels
        args.batch_size = gc.batch_size
        if gc.spectral_weight > 0 or gc.gradient_weight > 0:
            args.arch = "v2"
    if not args.data_dir:
        parser.error("--data-dir (or a --config with data_dir) is required")

    import optax

    from ..config import DataConfig, ExperimentConfig
    from ..data.dataset import load_chunked_datasets
    from ..models.grid_adapter import GridImageModel
    from ..models.unet import WeatherUNet, WeatherUNetV2
    from ..training.loss import gradient_loss, spectral_loss
    from ..training.trainer import Trainer

    train_ds, val_ds, _, meta = load_chunked_datasets(
        args.data_dir, obs_window=args.obs_window, pred_steps=args.max_ar,
        n_features=args.n_features,
    )
    c = meta.num_features
    n_lat, n_lon = meta.num_latitudes, meta.num_longitudes
    assert not meta.flat_grid, "U-Nets need a regular lat/lon grid"

    cfg = ExperimentConfig(
        batch_size=args.batch_size,
        learning_rate=args.lr,
        num_epochs=args.epochs,
        max_ar_steps=args.max_ar,
        static_channels=args.static_channels,
        forcing_channels=args.forcing_channels,
        data=DataConfig(
            dataset_name="unet", num_features_used=c,
            obs_window_used=args.obs_window, pred_window_used=args.max_ar,
            want_feats_flattened=True,
        ),
        data_dir=args.data_dir,
    )
    arch = WeatherUNet if args.arch == "v1" else WeatherUNetV2
    model = GridImageModel(
        image_module=arch(out_channels=c, base_filters=args.base_filters),
        n_lat=n_lat, n_lon=n_lon,
    )

    steps_per_epoch = max(len(train_ds) // args.batch_size, 1)
    schedule = optax.cosine_decay_schedule(
        args.lr, args.epochs * steps_per_epoch
    )
    opt = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(schedule)
    )

    extra = None
    if args.spectral_weight > 0 or args.gradient_weight > 0:
        sw, gw = args.spectral_weight, args.gradient_weight

        def extra(out, target):
            img_o = out.reshape(out.shape[:-2] + (n_lat, n_lon, c))
            img_t = target.reshape(target.shape[:-2] + (n_lat, n_lon, c))
            loss = 0.0
            if sw > 0:
                loss = loss + sw * spectral_loss(img_o, img_t)
            if gw > 0:
                loss = loss + gw * gradient_loss(img_o, img_t)
            return loss

    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "config.json"), "w") as f:
        f.write(cfg.model_dump_json(indent=1))
    trainer = Trainer(model, None, cfg, meta, args.out_dir, optimizer=opt,
                      extra_loss_fn=extra)
    state = trainer.init_state(seed=cfg.random_seed)
    trainer.fit(state, train_ds, val_ds,
                max_steps_per_epoch=args.max_steps_per_epoch)
    print(f"[done] results in {args.out_dir}")


if __name__ == "__main__":
    main()
