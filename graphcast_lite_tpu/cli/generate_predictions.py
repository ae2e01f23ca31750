"""Generate frozen-model predictions over a dataset period as a memmap.

~ reference ``scripts/generate_gnn_predictions.py``: run the trained global
model over the training (or any) split and store single-step predictions as
``gnn_pred.npy`` float16 — the training inputs for the downscaler cascade
(closes the train/inference domain gap: the downscaler learns on model
output, not on truth).

Usage: python -m graphcast_lite_tpu.cli.generate_predictions <exp_dir>
           [--data-dir D] [--split train] [--out gnn_pred.npy]
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
    parser.add_argument("--split", default="train",
                        choices=["train", "val", "test", "test_only", "all"])
    parser.add_argument("--out", default=None)
    parser.add_argument("--max-samples", type=int, default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..build import build_weather_model
    from ..config import load_experiment_config
    from ..data.dataset import ChunkedTimeseriesDataset, load_chunked_datasets
    from ..training import checkpoint as ckpt_lib

    cfg = load_experiment_config(os.path.join(args.exp_dir, "config.json"))
    data_dir = args.data_dir or cfg.data_dir
    c, obs = cfg.data.num_features_used, cfg.data.obs_window_used

    ds = ChunkedTimeseriesDataset(
        data_dir, obs_window=obs, pred_steps=1, split=args.split,
        n_features=c,
    )
    _, _, _, meta = load_chunked_datasets(data_dir, obs_window=obs,
                                          pred_steps=1, n_features=c)
    model, graphs, gs = build_weather_model(cfg, meta)
    dummy = np.zeros((gs.num_grid_nodes, obs * c), np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, graphs)
    params = ckpt_lib.load_params(
        os.path.join(args.exp_dir, "best_model.msgpack"), params
    )

    @jax.jit
    def predict(x):
        delta, _ = model.apply(params, x, graphs)
        last = x.reshape(gs.num_grid_nodes, obs, c)[:, -1, :]
        return last + delta if cfg.use_residual else delta

    n = len(ds)
    if args.max_samples:
        n = min(n, args.max_samples)
    out_path = args.out or os.path.join(data_dir, "gnn_pred.npy")
    mm = np.memmap(out_path, np.float16, "w+",
                   shape=(n, gs.num_grid_nodes, c))
    for i in range(n):
        x, _ = ds.get(i)
        mm[i] = np.asarray(predict(jnp.asarray(x)), np.float16)
        if (i + 1) % 50 == 0:
            print(f"  [{i + 1}/{n}]")
    mm.flush()
    with open(out_path + ".json", "w") as f:
        json.dump({"n_samples": n, "n_nodes": gs.num_grid_nodes,
                   "n_feat": c, "split": args.split}, f)
    print(f"[generate] {n} predictions -> {out_path}")


if __name__ == "__main__":
    main()
