"""Autoregressive rollout: the shared core of training, evaluation and
inference.

One rollout step (reference train_epoch inner loop, src/train.py:192-229):

  1. model(window.reshape(G, obs·C)) -> delta
  2. out = window[:, -1] + delta     (residual mode) | out = delta
  3. loss += weighted_mse(out, target_step)
  4. carry-forward: static channels from the last input frame, forcing
     channels from the ground-truth target (known in advance)
  5. window <- [window[1:], out]

The step is optionally wrapped in ``jax.checkpoint`` so BPTT through P steps
rematerializes instead of storing every intermediate (HBM-bound at 131K
nodes ✕ hidden 256).  The python loop over steps is static (≤ max_ar_steps),
so the whole rollout jits into one XLA program per curriculum level.

SparseGAT edge pruning is threaded as the explicit ``edge_mask`` state.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .loss import weighted_mse

__all__ = ["RolloutSpec", "rollout_loss", "rollout_predict", "carry_forward"]


@dataclasses.dataclass(frozen=True)
class RolloutSpec:
    """Static configuration of the AR rollout (hashable; jit-static).

    ``direct_steps > 1`` marks a DIRECT multi-step model (reference configs
    like wb2_64x32_15f_4pred whose decoder emits P·C channels in one
    forward, handled by the reference's DA rollout as "ВАРИАНТ А",
    src/assimilation/nudging.py:102-193): the rollout becomes a single
    model call reshaped to [..., G, P, C] — no AR loop, no window feedback.
    TPU-friendly by construction (one dispatch, one program)."""

    obs_window: int
    num_features: int
    use_residual: bool = True
    remat: bool = True
    static_channels: Tuple[int, ...] = ()
    forcing_channels: Tuple[int, ...] = ()
    direct_steps: int = 1

    def static_ch_mask(self) -> Optional[np.ndarray]:
        if not self.static_channels:
            return None
        m = np.zeros(self.num_features, np.float32)
        m[list(self.static_channels)] = 1.0
        return m

    def forcing_ch_mask(self) -> Optional[np.ndarray]:
        if not self.forcing_channels:
            return None
        m = np.zeros(self.num_features, np.float32)
        m[list(self.forcing_channels)] = 1.0
        return m


def carry_forward(
    out: jnp.ndarray,
    last_input: jnp.ndarray,
    target: Optional[jnp.ndarray],
    spec: RolloutSpec,
) -> jnp.ndarray:
    """Overwrite static channels from the last input frame and forcing
    channels from the ground-truth target (vectorized channel select).

    Masks are cast to ``out.dtype`` (0/1 are exact in bf16): a float32 mask
    would silently promote the whole AR window — and with it every model
    latent of subsequent steps — back to fp32 under mixed precision, which
    also breaks the processor scan's carry dtypes at AR >= 2."""
    sm = spec.static_ch_mask()
    if sm is not None:
        sm = jnp.asarray(sm, out.dtype)
        out = out * (1 - sm) + last_input * sm
    fm = spec.forcing_ch_mask()
    if fm is not None and target is not None:
        fm = jnp.asarray(fm, out.dtype)
        out = out * (1 - fm) + target * fm
    return out


def _one_step(
    model_fn: Callable,
    window: jnp.ndarray,      # [..., G, obs, C]
    edge_mask: Optional[jnp.ndarray],
    attention_threshold: jnp.ndarray,
    prune: bool,
    spec: RolloutSpec,
):
    """Run the model once on the flattened window.  Returns (out_raw, mask')."""
    g = window.shape[-3]
    inp = window.reshape(window.shape[:-3] + (g, spec.obs_window * spec.num_features))
    delta, new_mask = model_fn(inp, edge_mask, attention_threshold, prune)
    if spec.use_residual:
        out = window[..., -1, :] + delta
    else:
        out = delta
    return out, new_mask


def _direct_forward(
    model_fn: Callable,
    window: jnp.ndarray,        # [..., G, obs, C]
    steps: int,
    spec: RolloutSpec,
    edge_mask,
    attention_threshold,
    prune: bool,
    forcing: Optional[jnp.ndarray],   # [..., G, P, C] targets/forcing
):
    """One forward of a direct multi-step model -> ([..., G, steps, C], mask).

    Residual mode adds the last observed frame to EVERY step's delta (the
    natural extension; the reference leaves residual undefined for its
    4pred configs — documented divergence).  Carry-forward: static channels
    from the last input frame and forcing channels from the known-in-advance
    targets, applied to every step (the window never advances)."""
    g = window.shape[-3]
    p, c = spec.direct_steps, spec.num_features
    inp = window.reshape(window.shape[:-3] + (g, spec.obs_window * c))
    delta, new_mask = model_fn(inp, edge_mask, attention_threshold, prune)
    assert delta.shape[-1] == p * c, (
        f"direct_steps={p} x {c} features, model emitted {delta.shape[-1]}"
    )
    out = delta.reshape(delta.shape[:-1] + (p, c))[..., :steps, :]
    last = window[..., -1, :][..., None, :]
    if spec.use_residual:
        out = last + out
    sm = spec.static_ch_mask()
    if sm is not None:
        sm = jnp.asarray(sm, out.dtype)
        out = out * (1 - sm) + last * sm
    fm = spec.forcing_ch_mask()
    if fm is not None and forcing is not None:
        # Slice AFTER clipping out to `steps` so a forcing window shorter
        # than direct_steps (but >= steps) cannot shape-mismatch.
        out = out * (1 - jnp.asarray(fm, out.dtype)) \
            + forcing[..., :steps, :] * jnp.asarray(fm, out.dtype)
    return out, new_mask


def rollout_loss(
    model_fn: Callable,
    window: jnp.ndarray,        # [..., G, obs, C] current state
    targets: jnp.ndarray,       # [..., G, P, C]
    steps: int,
    spec: RolloutSpec,
    edge_mask: Optional[jnp.ndarray] = None,
    attention_threshold: jnp.ndarray | float = 0.0,
    prune: bool = False,
    lat_weights: Optional[jnp.ndarray] = None,
    chan_mask: Optional[jnp.ndarray] = None,
    spatial_mask: Optional[jnp.ndarray] = None,
    extra_loss_fn: Optional[Callable] = None,
):
    """Mean weighted-MSE over `steps` AR steps (BPTT through all of them).

    model_fn(inp [..., G, obs·C], edge_mask, thr, prune) -> (delta, mask').
    extra_loss_fn(out [..., G, C], target) -> scalar — additional loss terms
    added per step (e.g. spectral/Sobel losses for the CNN stacks).
    Returns (loss, new_edge_mask).
    """
    from ..ops.fused_edge import training_trace

    if spec.direct_steps > 1:
        steps = min(steps, spec.direct_steps)
        with training_trace():
            out, edge_mask = _direct_forward(
                model_fn, window, steps, spec, edge_mask,
                attention_threshold, prune, targets,
            )
            total = 0.0
            for step in range(steps):
                o, t = out[..., step, :], targets[..., step, :]
                total = total + weighted_mse(
                    o, t, lat_weights, chan_mask, spatial_mask
                )
                if extra_loss_fn is not None:
                    total = total + extra_loss_fn(o, t)
        return total / steps, edge_mask

    step_fn = _one_step
    if spec.remat:
        # prevent_cse must stay True (the default): the AR loop is a python
        # loop, and with CSE enabled XLA merges the backward's recompute
        # with the forward — silently re-saving every step's activations.
        step_fn = jax.checkpoint(_one_step, static_argnums=(0, 4, 5))

    total = 0.0
    # training_trace: this is the entry point every gradient path traces
    # through, so models pick their training-only kernels (the fused edge
    # pipeline) here and their inference kernels under rollout_predict.
    with training_trace():
        for step in range(steps):
            out, edge_mask = step_fn(
                model_fn, window, edge_mask, attention_threshold, prune, spec
            )
            target = targets[..., step, :]
            total = total + weighted_mse(
                out, target, lat_weights, chan_mask, spatial_mask
            )
            if extra_loss_fn is not None:
                total = total + extra_loss_fn(out, target)
            out = carry_forward(out, window[..., -1, :], target, spec)
            window = jnp.concatenate(
                [window[..., 1:, :], out[..., None, :]], axis=-2
            )
    return total / steps, edge_mask


def rollout_predict(
    model_fn: Callable,
    window: jnp.ndarray,         # [..., G, obs, C]
    steps: int,
    spec: RolloutSpec,
    edge_mask: Optional[jnp.ndarray] = None,
    attention_threshold: jnp.ndarray | float = 0.0,
    forcing: Optional[jnp.ndarray] = None,   # [..., G, P, C] known-in-advance
):
    """Pure AR inference: returns predictions [..., G, P, C].

    Forcing channels are taken from `forcing` when provided (the reference's
    predict loop substitutes ground-truth forcing, scripts/predict.py:528-565).
    """
    if spec.direct_steps > 1:
        if steps > spec.direct_steps:
            raise ValueError(
                f"direct model emits {spec.direct_steps} steps per forward; "
                f"{steps} requested — AR continuation of direct models is "
                "not defined (the window never advances)"
            )
        out, _ = _direct_forward(
            model_fn, window, steps, spec,
            edge_mask, attention_threshold, False, forcing,
        )
        return out

    outs = []
    for step in range(steps):
        out, edge_mask = _one_step(
            model_fn, window, edge_mask, attention_threshold, False, spec
        )
        tgt = forcing[..., step, :] if forcing is not None else None
        out = carry_forward(out, window[..., -1, :], tgt, spec)
        outs.append(out)
        window = jnp.concatenate(
            [window[..., 1:, :], out[..., None, :]], axis=-2
        )
    return jnp.stack(outs, axis=-2)
