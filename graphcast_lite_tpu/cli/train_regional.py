"""Regional refinement training CLI (dual-mesh or ROI-residual head).

~ reference ``scripts/train_dual_mesh.py`` / ``scripts/train_roi_residual.py``:
a frozen pretrained global model provides predictions + latents; a regional
corrector is trained on the ROI with an ROI-only loss.  Includes the
single-sample overfit sanity harness the reference runs before real
training (train_dual_mesh.py:63-135).

The global latents for each sample are computed once per epoch pass under
stop_gradient — the functional equivalent of the reference's cached
training mode (precompute_global/forward_cached).

Usage:
  python -m graphcast_lite_tpu.cli.train_regional <exp_dir> \\
      --head dual_mesh --roi 50 60 80 100 [--data-dir D] \\
      [--reg-level 3] [--epochs 20] [--overfit-test]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("exp_dir", help="global experiment dir (config.json + "
                        "best_model.msgpack)")
    parser.add_argument("--head", choices=["dual_mesh", "roi_residual"],
                        default="dual_mesh")
    parser.add_argument("--roi", type=float, nargs=4, required=True,
                        metavar=("LAT_MIN", "LAT_MAX", "LON_MIN", "LON_MAX"))
    parser.add_argument("--data-dir", default=None)
    parser.add_argument("--out-dir", default=None)
    parser.add_argument("--hidden", type=int, default=256)
    parser.add_argument("--reg-level", type=int, default=7)
    parser.add_argument("--global-level", type=int, default=None,
                        help="global mesh prefix level (default: max "
                        "mesh_levels of the config)")
    parser.add_argument("--processor-steps", type=int, default=None)
    parser.add_argument("--roi-k", type=int, default=8)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--max-steps-per-epoch", type=int, default=None)
    parser.add_argument("--overfit-test", action="store_true",
                        help="run the 1-sample overfit sanity check first")
    parser.add_argument("--evaluate", action="store_true",
                        help="after training (or on a saved head) run AR "
                        "evaluation of the composed model with region "
                        "metrics (~ reference predict_dual_mesh.py)")
    parser.add_argument("--evaluate-only", action="store_true")
    parser.add_argument("--ar-steps", type=int, default=1)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from ..build import build_weather_model
    from ..config import load_experiment_config
    from ..data.dataset import load_chunked_datasets
    from ..training import checkpoint as ckpt_lib
    from ..training.loss import weighted_mse

    cfg = load_experiment_config(os.path.join(args.exp_dir, "config.json"))
    data_dir = args.data_dir or cfg.data_dir
    out_dir = args.out_dir or os.path.join(args.exp_dir, f"{args.head}_head")
    os.makedirs(out_dir, exist_ok=True)
    roi = tuple(args.roi)

    train_ds, val_ds, _, meta = load_chunked_datasets(
        data_dir, obs_window=cfg.data.obs_window_used,
        pred_steps=1, n_features=cfg.data.num_features_used,
    )
    c = cfg.data.num_features_used
    obs = cfg.data.obs_window_used

    # Frozen global model.
    model, graphs, gs = build_weather_model(cfg, meta)
    dummy = np.zeros((gs.num_grid_nodes, obs * c), np.float32)
    gparams = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, graphs)
    ckpt = os.path.join(args.exp_dir, "best_model.msgpack")
    if os.path.exists(ckpt):
        gparams = ckpt_lib.load_params(ckpt, gparams)
        print(f"[regional] loaded global params from {ckpt}")
    else:
        print("[regional] WARNING: no global checkpoint; frozen random init")

    def global_apply(x):
        pred, _, grid_lat, mesh_proc = model.apply(
            gparams, x, graphs, with_latents=True
        )
        return pred, grid_lat, mesh_proc

    enc_dim = None  # latent dim inferred from a probe below
    probe_pred, probe_lat, probe_mesh = jax.eval_shape(
        global_apply, jnp.zeros((gs.num_grid_nodes, obs * c))
    )
    d_g = probe_lat.shape[-1]

    # Regional head + graphs.
    if args.head == "dual_mesh":
        from ..graphs.regional import build_regional_graphs
        from ..models.dual_mesh import (
            DualMeshRegional, RegionalDeviceGraphs, dual_mesh_forward,
        )

        glevel = args.global_level or max(cfg.graph.mesh_levels)
        rg = build_regional_graphs(
            gs.mesh_lat, gs.mesh_lon, gs.grid_lat, gs.grid_lon, roi,
            reg_mesh_level=args.reg_level, global_level=glevel,
        )
        rgraphs = RegionalDeviceGraphs.from_host(rg, gs.num_grid_nodes)
        module = DualMeshRegional(
            hidden_dim=args.hidden, output_channels=c,
            processor_steps=args.processor_steps or 4,
        )
        rparams = module.init(
            jax.random.PRNGKey(1),
            jnp.zeros((rg.n_roi, obs * c)), jnp.zeros((rg.n_roi, d_g)),
            jnp.zeros((gs.num_mesh_nodes, d_g)), rgraphs,
        )
        roi_idx = rgraphs.roi_idx

        def forward(rp, x):
            return dual_mesh_forward(
                global_apply,
                lambda rr, rl, ml: module.apply(rp, rr, rl, ml, rgraphs),
                x, rgraphs,
            )
    else:
        from ..graphs.regional import build_roi_knn_graph
        from ..models.roi_residual import (
            ROIResidualModule, roi_residual_forward,
        )

        roi_mask, roi_graph = build_roi_knn_graph(
            gs.grid_lat, gs.grid_lon, roi, k=args.roi_k
        )
        roi_idx = jnp.asarray(np.flatnonzero(roi_mask))
        module = ROIResidualModule(
            hidden_dim=args.hidden, output_channels=c,
            processor_steps=args.processor_steps or 6,
        )
        n_roi = int(roi_mask.sum())
        rparams = module.init(
            jax.random.PRNGKey(1),
            jnp.zeros((n_roi, obs * c)), jnp.zeros((n_roi, d_g)),
            jnp.zeros((n_roi, c)), roi_graph,
        )

        def forward(rp, x):
            return roi_residual_forward(
                global_apply,
                lambda rr, rl, pp, gr: module.apply(rp, rr, rl, pp, gr),
                x, roi_idx, roi_graph,
            )

    n_params = sum(p.size for p in jax.tree.leaves(rparams))
    print(f"[regional] {args.head} head: {n_params:,} trainable params, "
          f"{len(np.asarray(roi_idx))} ROI nodes")

    def loss_fn(rp, x, y):
        out = forward(rp, x)
        return weighted_mse(out[roi_idx], y[roi_idx])

    opt = optax.adam(args.lr)
    opt_state = opt.init(rparams)

    @jax.jit
    def step(rp, os_, x, y):
        # training_trace: regional graphs rarely meet the fused-edge size
        # gate, but the frozen GLOBAL forward inside loss_fn does at 512x256 —
        # mark the trace so it picks its training kernels (ops/fused_edge.py).
        from ..ops.fused_edge import training_trace

        with training_trace():
            loss, grads = jax.value_and_grad(loss_fn)(rp, x, y)
        updates, os_ = opt.update(grads, os_, rp)
        return optax.apply_updates(rp, updates), os_, loss

    head_path = os.path.join(out_dir, "regional_head.msgpack")

    def run_evaluation(rp):
        """Composed-model AR evaluation with ROI metrics
        (~ reference scripts/predict_dual_mesh.py)."""
        from ..inference.predict import evaluate_model

        class _Composed:
            """Duck-typed model: apply() returns the composed delta."""

            @staticmethod
            def apply(params, x, graphs_=None, edge_mask=None, *a, **k):
                return forward(params, x), edge_mask

        _, _, eval_ds, _ = load_chunked_datasets(
            data_dir, obs_window=obs,
            pred_steps=max(args.ar_steps, 1), n_features=c,
        )
        report = evaluate_model(
            _Composed, rp, None, eval_ds, meta, ar_steps=args.ar_steps,
            use_residual=cfg.use_residual,
            static_channels=tuple(cfg.static_channels),
            forcing_channels=tuple(cfg.forcing_channels),
            region=roi,
        )
        print(report.summary())
        return report

    if args.evaluate_only:
        if os.path.exists(head_path):
            rparams = ckpt_lib.load_params(head_path, rparams)
            print(f"[regional] loaded head {head_path}")
        run_evaluation(rparams)
        return

    if args.overfit_test:
        x0, y0 = train_ds.get(0)
        x0 = jnp.asarray(x0)
        y0 = jnp.asarray(y0.reshape(-1, 1, c)[:, 0, :])
        p, s = rparams, opt.init(rparams)
        l0 = float(loss_fn(p, x0, y0))
        for _ in range(100):
            p, s, loss = step(p, s, x0, y0)
        print(f"[overfit-test] loss {l0:.5f} -> {float(loss):.5f} "
              f"({'OK' if float(loss) < l0 * 0.5 else 'WEAK'}) "
              "(weights discarded)")

    best = float("inf")
    for epoch in range(args.epochs):
        total, nb = 0.0, 0
        for i in range(len(train_ds)):
            if args.max_steps_per_epoch and i >= args.max_steps_per_epoch:
                break
            x, y = train_ds.get(i)
            rparams, opt_state, loss = step(
                rparams, opt_state, jnp.asarray(x),
                jnp.asarray(y.reshape(-1, 1, c)[:, 0, :]),
            )
            total += float(loss)
            nb += 1
        vtotal, vn = 0.0, 0
        for i in range(len(val_ds)):
            x, y = val_ds.get(i)
            vtotal += float(loss_fn(rparams, jnp.asarray(x),
                                    jnp.asarray(y.reshape(-1, 1, c)[:, 0, :])))
            vn += 1
        v = vtotal / max(vn, 1)
        print(f"[epoch {epoch + 1}] train={total / max(nb, 1):.5f} val={v:.5f}")
        if v < best:
            best = v
            ckpt_lib.save_params(head_path, rparams)
    print(f"[done] best val {best:.5f}; head saved in {out_dir}")
    if args.evaluate:
        run_evaluation(rparams)


if __name__ == "__main__":
    main()
