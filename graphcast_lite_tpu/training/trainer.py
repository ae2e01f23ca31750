"""Training loop: AR curriculum, early stopping, freeze/differential-LR
fine-tuning, SparseGAT threshold schedule, checkpoint/resume.

Functional re-design of reference ``src/train.py:311-524``:

* the whole (rollout → loss → grad → adam) step jits into one XLA program;
  recompilation happens only when a *static* knob changes (curriculum AR
  level, prune flag, processor freeze) — at most a handful per run;
* the SparseGAT pruning state is the explicit edge mask carried in
  ``TrainState`` (reference mutates the model's graph in place);
* processor freezing is a gradient mask + a per-subtree learning-rate scale
  via ``optax.multi_transform`` (reference rebuilds torch param groups).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from datetime import datetime
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..config import ExperimentConfig, GraphLayerType
from ..data.dataset import BatchIterator, ChunkedTimeseriesDataset, DatasetMetadata
from ..models.weather import ModelGraphs, WeatherModel
from . import checkpoint as ckpt_lib
from .loss import (
    anomaly_correlation,
    boundary_mask,
    channel_mask,
    combine_spatial_masks,
    lat_weights_from_axis,
    lat_weights_from_nodes,
    weighted_mse,
)
from .rollout import RolloutSpec, rollout_loss, rollout_predict

__all__ = [
    "TrainState",
    "Trainer",
    "attention_threshold_schedule",
    "build_optimizer",
]


def attention_threshold_schedule(
    epoch: int,
    max_epochs: int = 30,
    start_epoch: int = 5,
    final_threshold: float = 0.1356,
) -> float:
    """Linear ramp 0 -> final between start_epoch and start_epoch+max_epochs
    (reference update_attention_threshold, src/train.py:132-136)."""
    if epoch < start_epoch:
        return 0.0
    if epoch > max_epochs + start_epoch:
        return final_threshold
    return min(
        final_threshold,
        (epoch - start_epoch) * final_threshold / (max_epochs - start_epoch),
    )


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    edge_mask: Optional[jnp.ndarray]  # SparseGAT pruning state (or None)


def build_optimizer(
    learning_rate: float, processor_lr_factor: float = 1.0
) -> optax.GradientTransformation:
    """Adam with an optional reduced LR on the processor subtree
    (reference differential-LR fine-tuning, src/main.py:190-212)."""
    if processor_lr_factor == 1.0:
        return optax.adam(learning_rate)

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda kp, _: "processor"
            if any(getattr(k, "key", None) == "processor" for k in kp)
            else "rest",
            params,
        )

    return optax.multi_transform(
        {
            "rest": optax.adam(learning_rate),
            "processor": optax.adam(learning_rate * processor_lr_factor),
        },
        label_fn,
    )


def _zero_processor_grads(grads):
    def zero(kp, g):
        if any(getattr(k, "key", None) == "processor" for k in kp):
            return jnp.zeros_like(g)
        return g

    return jax.tree_util.tree_map_with_path(zero, grads)


class Trainer:
    """Owns the jitted step functions and the python-side epoch loop."""

    def __init__(
        self,
        model: WeatherModel,
        graphs: ModelGraphs,
        config: ExperimentConfig,
        metadata: DatasetMetadata,
        results_dir: str,
        processor_lr_factor: float = 1.0,
        optimizer: Optional[optax.GradientTransformation] = None,
        extra_loss_fn: Optional[Callable] = None,
        mesh=None,
        graph_set=None,
    ):
        """``mesh`` (a 2-D ("data", "space") jax.sharding.Mesh) + ``graph_set``
        (the host-side GraphSet) switch training to the integrated sharded
        path (parallel/sharded_model.py): explicit shard_map over latitude
        bands for all three graphs, batch data-parallel over "data"."""
        self.model = model
        self.graphs = graphs
        self.config = config
        self.metadata = metadata
        self.results_dir = results_dir
        os.makedirs(results_dir, exist_ok=True)

        from ..build import config_direct_steps

        self.spec = RolloutSpec(
            obs_window=config.data.obs_window_used,
            num_features=config.data.num_features_used,
            use_residual=config.use_residual,
            remat=config.tpu.remat_rollout,
            static_channels=tuple(config.static_channels),
            forcing_channels=tuple(config.forcing_channels),
            direct_steps=config_direct_steps(config),
        )
        self.using_sparse_gat = (
            config.pipeline is not None
            and config.pipeline.processor.gcn.layer_type
            == GraphLayerType.SparseGATConv
        )

        # ---- loss weights / masks (host-built constants) --------------------
        lw = None
        if config.use_latitude_weighting:
            if metadata.flat_grid and metadata.coordinates is not None:
                lw = lat_weights_from_nodes(metadata.coordinates[0])
            else:
                lw = lat_weights_from_axis(
                    metadata.num_latitudes, metadata.num_longitudes
                )
        self.lat_weights = jnp.asarray(lw) if lw is not None else None

        cm = channel_mask(
            config.data.num_features_used,
            config.static_channels,
            config.forcing_channels,
        )
        self.chan_mask = jnp.asarray(cm) if cm is not None else None

        sm = None
        if config.boundary_mask_width > 0 and not metadata.flat_grid:
            sm = boundary_mask(
                metadata.num_latitudes,
                metadata.num_longitudes,
                config.boundary_mask_width,
            )
        roi = None
        if config.roi_only_loss and metadata.is_regional is not None:
            roi = metadata.is_regional.astype(np.float32)
        sm = combine_spatial_masks(sm, roi)
        self.spatial_mask = jnp.asarray(sm) if sm is not None else None

        self.optimizer = optimizer if optimizer is not None else build_optimizer(
            config.learning_rate, processor_lr_factor
        )
        self.extra_loss_fn = extra_loss_fn
        self._train_step_cache: Dict[Tuple, Callable] = {}
        self._eval_step_cache: Optional[Callable] = None
        self._graphs_cast_cache: Optional[ModelGraphs] = None

        # ---- integrated multi-chip path (parallel/sharded_model) ------------
        self.mesh = mesh
        self._plan = None
        self._plan_arrays = None
        self._sharded_fwd = None
        if mesh is not None:
            from ..parallel.sharded_model import (
                ShardedWeatherForward,
                build_sharding_plan,
                plan_device_arrays,
            )

            if graph_set is None:
                raise ValueError("mesh= requires graph_set= (host GraphSet)")
            if extra_loss_fn is not None:
                raise NotImplementedError(
                    "extra_loss_fn is not supported on the sharded path"
                )
            data_ax = int(mesh.devices.shape[0])
            if config.batch_size % data_ax != 0:
                raise ValueError(
                    f"config.batch_size ({config.batch_size}) must be "
                    f"divisible by the data-parallel mesh axis ({data_ax})"
                )
            n_space = int(mesh.devices.shape[-1])
            self._plan = build_sharding_plan(graph_set, n_space)
            self._plan_arrays = plan_device_arrays(
                self._plan, graph_set,
                lat_weights=np.asarray(self.lat_weights)
                if self.lat_weights is not None else None,
                spatial_mask=np.asarray(self.spatial_mask)
                if self.spatial_mask is not None else None,
            )
            self._sharded_fwd = ShardedWeatherForward(
                config.pipeline, config.data, n_space
            )

    # ------------------------------------------------------------------ core
    def init_state(self, seed: Optional[int] = None) -> TrainState:
        obs, feats = self.spec.obs_window, self.spec.num_features
        g = self.model.num_grid_nodes
        dummy = jnp.zeros((g, obs * feats), jnp.float32)
        params = self.model.init(
            jax.random.PRNGKey(seed if seed is not None else 42), dummy,
            self.graphs,
        )
        mask = None
        if self.using_sparse_gat:
            # mesh path: the pruning state lives in the per-shard [S, E]
            # layout of the sharding plan; single-chip: padded COO [E_pad]
            mask = (
                self._plan_arrays.proc.edge_mask
                if self.mesh is not None
                else self.graphs.processing.edge_mask
            )
        return TrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            edge_mask=mask,
        )

    def _graphs_for(self, dtype) -> ModelGraphs:
        """Graph bundle with float leaves in the compute dtype.

        Without this, f32 ``grid_static``/``edge_attr`` promote the
        encoder/processor back to fp32 under mixed precision (measured
        2709 -> 1959 ms per 512x256 train step when fixed)."""
        if dtype == jnp.float32:
            return self.graphs
        if self._graphs_cast_cache is None:
            self._graphs_cast_cache = jax.tree.map(
                lambda a: a.astype(dtype)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
                self.graphs,
            )
        return self._graphs_cast_cache

    def _batched_apply(self, params, inp, mask, thr, prune: bool,
                       graphs: Optional[ModelGraphs] = None):
        """vmap the single-sample model over the batch; graphs shared.

        The Pallas segment kernel carries a custom batching rule (batch
        folded into the feature axis — ``ops.pallas_segment``), so the whole
        model vmaps; XLA then batches every dense matmul instead of
        replaying the program per sample (the old ``lax.map`` path, kept
        under GCLT_BATCH_VMAP=0).  Returns (delta [B,G,C], mask') with
        mask' from sample 0 (pruning is a batch-level decision, reference
        prunes on batch_num==0)."""
        graphs = self.graphs if graphs is None else graphs

        def single(x):
            return self.model.apply(params, x, graphs, mask, thr, prune)

        if inp.shape[0] == 1:
            out, new_mask = single(inp[0])
            return out[None], new_mask
        import os

        if os.environ.get("GCLT_BATCH_VMAP", "1") in ("0", "false", "off"):
            out, masks = jax.lax.map(single, inp)
        else:
            out, masks = jax.vmap(single)(inp)
        new_mask = None
        if masks is not None:
            new_mask = jax.tree.map(lambda m: m[0], masks)
        return out, new_mask

    @property
    def _compute_dtype(self):
        name = (self.config.tpu.compute_dtype or "float32").lower()
        return jnp.bfloat16 if name in ("bfloat16", "bf16") else jnp.float32

    def _make_train_step(self, steps: int, prune: bool, freeze_processor: bool):
        cdtype = self._compute_dtype
        # Cast eagerly (outside the jit trace — a trace-time cast would leak
        # tracers through the cache).  Graphs (static features, edge attrs,
        # masks) must be cast too, or their f32 leaves promote the whole
        # forward back to fp32.
        graphs_c = self._graphs_for(cdtype)

        def loss_fn(params, window, targets, edge_mask, thr):
            # Mixed precision: bf16 compute against fp32 master params
            # (config.tpu.compute_dtype); loss/grads re-cast to fp32.
            params_c = params
            if cdtype != jnp.float32:
                params_c = jax.tree.map(
                    lambda p: p.astype(cdtype)
                    if p.dtype == jnp.float32 else p,
                    params,
                )
                window = window.astype(cdtype)
                targets = targets.astype(cdtype)
                if edge_mask is not None:
                    edge_mask = edge_mask.astype(cdtype)
            model_fn = lambda inp, m, t, p: self._batched_apply(
                params_c, inp, m, t, p, graphs=graphs_c
            )
            loss, new_mask = rollout_loss(
                model_fn,
                window,
                targets,
                steps,
                self.spec,
                edge_mask,
                thr,
                prune,
                self.lat_weights,
                self.chan_mask,
                self.spatial_mask,
                extra_loss_fn=self.extra_loss_fn,
            )
            if new_mask is not None:
                # keep the pruning state f32 across steps (stable jit
                # signature; 0/1 values are exact either way)
                new_mask = new_mask.astype(jnp.float32)
            return loss.astype(jnp.float32), new_mask

        def step(state: TrainState, x, y, thr):
            b, g = x.shape[0], x.shape[1]
            window = x.reshape(b, g, self.spec.obs_window, self.spec.num_features)
            p = y.shape[-1] // self.spec.num_features
            targets = y.reshape(b, g, p, self.spec.num_features)
            (loss, new_mask), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, window, targets, state.edge_mask, thr)
            grads = jax.tree.map(
                lambda g: g.astype(jnp.float32)
                if g.dtype == jnp.bfloat16 else g, grads
            )
            if freeze_processor:
                grads = _zero_processor_grads(grads)
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(params=params, opt_state=opt_state,
                           edge_mask=new_mask),
                loss,
            )

        return jax.jit(step, donate_argnums=(0,))

    def train_step(self, state, x, y, steps, thr, prune, freeze_processor):
        if self.mesh is not None:
            return self._sharded_train_step(state, x, y, steps, thr, prune,
                                            freeze_processor)
        key = (int(steps), bool(prune), bool(freeze_processor),
               tuple(x.shape))
        if key not in self._train_step_cache:
            self._train_step_cache[key] = self._make_train_step(
                steps, prune, freeze_processor
            )
        return self._train_step_cache[key](
            state, jnp.asarray(x), jnp.asarray(y), jnp.asarray(thr)
        )

    def _sharded_train_step(self, state, x, y, steps, thr, prune,
                            freeze_processor):
        from ..parallel.sharded_model import make_sharded_train_step

        data_ax = int(self.mesh.devices.shape[0])
        if x.shape[0] % data_ax != 0:
            raise ValueError(
                f"sharded training needs batch ({x.shape[0]}) divisible by "
                f"the data-parallel axis ({data_ax}); use drop_remainder "
                "batching or a compatible batch_size"
            )
        key = ("sharded", int(steps), bool(prune), bool(freeze_processor),
               tuple(x.shape))
        if key not in self._train_step_cache:
            self._train_step_cache[key] = make_sharded_train_step(
                self._sharded_fwd, self.spec, self.mesh, self.optimizer,
                steps, chan_mask=self.chan_mask,
                compute_dtype=self._compute_dtype,
                freeze_processor=freeze_processor,
                prune=prune,
            )
        x_sh = jnp.asarray(self._plan.scatter_grid(np.asarray(x)))
        y_sh = jnp.asarray(self._plan.scatter_grid(np.asarray(y)))
        if self.using_sparse_gat:
            params, opt_state, loss, new_mask = self._train_step_cache[key](
                state.params, state.opt_state, x_sh, y_sh,
                self._plan_arrays, state.edge_mask, jnp.asarray(thr),
            )
            return TrainState(params=params, opt_state=opt_state,
                              edge_mask=new_mask), loss
        params, opt_state, loss = self._train_step_cache[key](
            state.params, state.opt_state, x_sh, y_sh, self._plan_arrays
        )
        return TrainState(params=params, opt_state=opt_state,
                          edge_mask=None), loss

    def _make_eval_step(self):
        exclude = tuple(
            sorted(set(self.config.static_channels)
                   | set(self.config.forcing_channels))
        )

        def step(params, edge_mask, x, y):
            b, g = x.shape[0], x.shape[1]
            window = x.reshape(b, g, self.spec.obs_window, self.spec.num_features)
            p_total = y.shape[-1] // self.spec.num_features
            targets = y.reshape(b, g, p_total, self.spec.num_features)
            model_fn = lambda inp, m, t, pr: self._batched_apply(
                params, inp, m, t, pr
            )
            preds = rollout_predict(
                model_fn, window, 1, self.spec, edge_mask, 0.0,
                forcing=targets,
            )  # [B, G, 1, C] with carry-forward applied
            out = preds[..., 0, :]
            tgt = targets[..., 0, :]
            loss = weighted_mse(
                out, tgt, self.lat_weights, self.chan_mask, self.spatial_mask
            )
            acc = anomaly_correlation(out, tgt, exclude)
            raw_rmse = jnp.sqrt(jnp.mean(jnp.square(out - tgt)))
            return loss, acc, raw_rmse

        return jax.jit(step)

    def evaluate(self, state: TrainState, loader: BatchIterator):
        if self.mesh is not None:
            return self._sharded_evaluate(state, loader)
        if self._eval_step_cache is None:
            self._eval_step_cache = self._make_eval_step()
        losses, accs, rmses = [], [], []
        for x, y in loader:
            l, a, r = self._eval_step_cache(
                state.params, state.edge_mask, jnp.asarray(x), jnp.asarray(y)
            )
            losses.append(float(l))
            accs.append(float(a))
            rmses.append(float(r) ** 2)
        n = max(len(losses), 1)
        return (
            sum(losses) / n,
            sum(accs) / n,
            (sum(rmses) / n) ** 0.5,
        )

    def _sharded_evaluate(self, state: TrainState, loader: BatchIterator):
        from ..parallel.sharded_model import make_sharded_eval_step

        if self._eval_step_cache is None:
            exclude = tuple(
                sorted(set(self.config.static_channels)
                       | set(self.config.forcing_channels))
            )
            self._eval_step_cache = make_sharded_eval_step(
                self._sharded_fwd, self.spec, self.mesh,
                chan_mask=self.chan_mask, exclude_channels=exclude,
            )
        data_ax = int(self.mesh.devices.shape[0])
        losses, accs, rmses = [], [], []
        for x, y in loader:
            x, y = np.asarray(x), np.asarray(y)
            # Pad partial batches to a multiple of the data axis; padded
            # samples carry mask 0 and do not affect any metric.
            b = x.shape[0]
            b_pad = ((b + data_ax - 1) // data_ax) * data_ax
            mask = np.zeros(b_pad, np.float32)
            mask[:b] = 1.0
            if b_pad != b:
                pad = ((0, b_pad - b),) + ((0, 0),) * (x.ndim - 1)
                x = np.pad(x, pad)
                y = np.pad(y, ((0, b_pad - b),) + ((0, 0),) * (y.ndim - 1))
            args = (
                state.params,
                jnp.asarray(self._plan.scatter_grid(x)),
                jnp.asarray(self._plan.scatter_grid(y)),
                jnp.asarray(mask),
                self._plan_arrays,
            )
            if self.using_sparse_gat:
                args = args + (state.edge_mask,)
            l, a, r = self._eval_step_cache(*args)
            losses.append(float(l))
            accs.append(float(a))
            rmses.append(float(r) ** 2)
        n = max(len(losses), 1)
        return (
            sum(losses) / n,
            sum(accs) / n,
            (sum(rmses) / n) ** 0.5,
        )

    # ------------------------------------------------------------------ loop
    def fit(
        self,
        state: TrainState,
        train_ds: ChunkedTimeseriesDataset,
        val_ds: ChunkedTimeseriesDataset,
        resume: bool = False,
        print_losses: bool = True,
        max_steps_per_epoch: Optional[int] = None,
    ) -> Dict[str, Any]:
        cfg = self.config
        num_epochs = cfg.num_epochs
        max_ar = max(cfg.max_ar_steps, 1)
        epochs_per_stage = num_epochs // max_ar if max_ar > 0 else num_epochs
        epochs_per_stage = max(epochs_per_stage, 1)

        train_losses: List[float] = []
        val_losses: List[float] = []
        best_val = float("inf")
        patience = 0
        start_epoch = 0
        ar_steps = 1

        ckpt_dir = os.path.join(self.results_dir, "checkpoint")
        if resume and os.path.exists(os.path.join(ckpt_dir, "meta.json")):
            params, opt_state, mask, meta = ckpt_lib.load_checkpoint(
                ckpt_dir, state.params, state.opt_state, state.edge_mask
            )
            state = TrainState(params=params, opt_state=opt_state,
                               edge_mask=mask)
            start_epoch = meta["epoch"] + 1
            ar_steps = meta["ar_steps"]
            best_val = meta["best_val_loss"]
            patience = meta["patience_counter"]
            train_losses = meta["train_losses"]
            val_losses = meta["val_losses"]
            print(f">>> Resumed from epoch {start_epoch}, AR={ar_steps}, "
                  f"best_val={best_val:.5f}")

        log_path = os.path.join(self.results_dir, "training_log.txt")

        def log(msg: str):
            with open(log_path, "a") as f:
                f.write(msg + "\n")

        from ..utils.logs import MetricsLogger

        metrics = MetricsLogger(self.results_dir)
        profile_dir = os.environ.get("GCLT_PROFILE_DIR")

        log(f"=== Training started: {datetime.now().isoformat()} ===")
        log(f"epochs={num_epochs}  max_ar={max_ar}  "
            f"epochs_per_stage={epochs_per_stage}")
        log(f"{'epoch':>5}  {'ar':>2}  {'train_loss':>10}  {'val_loss':>10}  "
            f"{'val_ACC':>8}  {'best_vl':>10}  {'patience':>8}  time")

        val_loader = BatchIterator(val_ds, cfg.batch_size, shuffle=False,
                                   drop_remainder=False)
        if start_epoch == 0 and len(val_ds):
            v_loss, v_acc, v_rmse = self.evaluate(state, val_loader)
            if print_losses:
                print(f"[Init] val_loss={v_loss:.5f} val_acc={v_acc:.4f} "
                      f"raw_RMSE={v_rmse:.4f}")
            log(f"{'init':>5}  {'--':>2}  {'--':>10}  {v_loss:10.5f}  "
                f"{v_acc:8.4f}  {'--':>10}  {'--':>8}  "
                f"{datetime.now().strftime('%H:%M:%S')}")

        for epoch in range(start_epoch, num_epochs):
            t_epoch = time.time()
            correct_ar = min(1 + epoch // epochs_per_stage, max_ar)
            if correct_ar > ar_steps:
                ar_steps = correct_ar
                patience = 0
                if print_losses:
                    print(f">>> Curriculum: AR level raised to {ar_steps}")

            thr = attention_threshold_schedule(epoch)
            freeze = (
                cfg.freeze_processor_epochs > 0
                and epoch < cfg.freeze_processor_epochs
            )

            # ---- train epoch ------------------------------------------------
            loader = BatchIterator(
                train_ds, cfg.batch_size, shuffle=True,
                seed=cfg.random_seed or 42,
            )
            total, n_batches = 0.0, 0
            for i, (x, y) in enumerate(loader):
                if max_steps_per_epoch and i >= max_steps_per_epoch:
                    break
                prune = self.using_sparse_gat and i == 0 and thr > 0
                p_avail = y.shape[-1] // self.spec.num_features
                steps = min(ar_steps, p_avail)
                capture = profile_dir and epoch == start_epoch and i == 1
                if capture:  # pragma: no cover - profiling side channel
                    jax.profiler.start_trace(profile_dir)
                state, loss = self.train_step(
                    state, x, y, steps, thr, prune, freeze
                )
                if capture:  # pragma: no cover
                    jax.block_until_ready(loss)
                    jax.profiler.stop_trace()
                    print(f"[profiler] step trace -> {profile_dir}")
                total += float(loss)
                n_batches += 1
            train_loss = total / max(n_batches, 1)

            v_loss, v_acc, v_rmse = self.evaluate(state, val_loader)
            train_losses.append(train_loss)
            val_losses.append(v_loss)

            if print_losses:
                print(
                    f"[Epoch {epoch + 1}] train={train_loss:.5f} "
                    f"val={v_loss:.5f} ACC={v_acc:.4f} rawRMSE={v_rmse:.4f} "
                    f"AR={ar_steps} ({time.time() - t_epoch:.1f}s)"
                )

            metrics.log({
                "epoch": epoch + 1, "ar_steps": ar_steps,
                "train_loss": train_loss, "val_loss": v_loss,
                "val_acc": v_acc, "raw_rmse": v_rmse,
                "attention_threshold": thr,
                "epoch_seconds": time.time() - t_epoch,
            })

            if best_val - v_loss > cfg.early_stopping_delta:
                best_val = v_loss
                patience = 0
                ckpt_lib.save_params(
                    os.path.join(self.results_dir, "best_model.msgpack"),
                    state.params,
                )
            else:
                patience += 1

            log(f"{epoch + 1:5d}  {ar_steps:2d}  {train_loss:10.5f}  "
                f"{v_loss:10.5f}  {v_acc:8.4f}  {best_val:10.5f}  "
                f"{patience:8d}  {datetime.now().strftime('%H:%M:%S')}")

            ckpt_lib.save_checkpoint(
                ckpt_dir,
                state.params,
                state.opt_state,
                state.edge_mask,
                {
                    "epoch": epoch,
                    "ar_steps": ar_steps,
                    "best_val_loss": best_val,
                    "patience_counter": patience,
                    "train_losses": train_losses,
                    "val_losses": val_losses,
                },
            )

            if patience >= cfg.early_stopping_patience:
                if print_losses:
                    print("Early stopping.")
                log(f">>> Early stopping at epoch {epoch + 1}")
                break

        log(f"=== Training finished: {datetime.now().isoformat()} ===")
        results = {"train_losses": train_losses, "val_losses": val_losses}
        with open(os.path.join(self.results_dir, "results.json"), "w") as f:
            json.dump(results, f)
        self.final_state = state
        return results
