"""Checkpoint / resume (reference src/train.py:22-49 equivalent).

A checkpoint is a directory:

  <dir>/state.msgpack   params + opt_state + SparseGAT edge mask
                        (flax.serialization, framework-independent bytes)
  <dir>/meta.json       epoch, ar_steps, best_val_loss, patience_counter,
                        loss histories — the curriculum position

The best model is saved separately as ``best_model.msgpack`` (params only),
like the reference's ``best_model.pth``.  Loading with a structurally
different target (e.g. pruned-mesh fine-tuning) supports ``strict=False``:
only matching subtrees are restored, missing/unexpected keys reported
(reference src/main.py:179-188).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization
from flax.core import unfreeze

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "save_params",
    "load_params",
    "partial_restore",
]


def save_params(path: str, params: Any) -> None:
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_checkpoint(
    ckpt_dir: str,
    params: Any,
    opt_state: Any,
    edge_mask: Any,
    meta: Dict[str, Any],
) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    blob = {
        "params": params,
        "opt_state": opt_state,
        "edge_mask": edge_mask if edge_mask is not None else {},
    }
    with open(os.path.join(ckpt_dir, "state.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(blob))
    with open(os.path.join(ckpt_dir, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_checkpoint(
    ckpt_dir: str,
    params_template: Any,
    opt_state_template: Any,
    edge_mask_template: Any,
) -> Tuple[Any, Any, Any, Dict[str, Any]]:
    blob_template = {
        "params": params_template,
        "opt_state": opt_state_template,
        "edge_mask": edge_mask_template if edge_mask_template is not None else {},
    }
    with open(os.path.join(ckpt_dir, "state.msgpack"), "rb") as f:
        blob = serialization.from_bytes(blob_template, f.read())
    with open(os.path.join(ckpt_dir, "meta.json")) as f:
        meta = json.load(f)
    mask = blob["edge_mask"]
    if isinstance(mask, dict) and not mask:
        mask = None
    return blob["params"], blob["opt_state"], mask, meta


def partial_restore(template: Any, saved: Any, verbose: bool = True):
    """Non-strict restore: copy leaves whose paths+shapes match; report the
    rest.  The functional analogue of ``load_state_dict(strict=False)``."""
    t_flat = jax.tree_util.tree_flatten_with_path(unfreeze(template))[0]
    s_flat = dict(
        (jax.tree_util.keystr(kp), v)
        for kp, v in jax.tree_util.tree_flatten_with_path(unfreeze(saved))[0]
    )
    missing, loaded, mismatched = [], {}, []
    for kp, leaf in t_flat:
        key = jax.tree_util.keystr(kp)
        if key in s_flat:
            if getattr(s_flat[key], "shape", None) == getattr(leaf, "shape", None):
                loaded[key] = s_flat[key]
            else:
                mismatched.append(key)
        else:
            missing.append(key)
    unexpected = [k for k in s_flat if k not in {jax.tree_util.keystr(kp) for kp, _ in t_flat}]

    def restore(kp, leaf):
        return loaded.get(jax.tree_util.keystr(kp), leaf)

    out = jax.tree_util.tree_map_with_path(restore, template)
    if verbose and (missing or unexpected or mismatched):
        print(
            f"[partial_restore] missing={len(missing)} unexpected="
            f"{len(unexpected)} shape-mismatched={len(mismatched)}"
        )
        for k in (missing + mismatched)[:10]:
            print(f"  - {k}")
    return out, {"missing": missing, "unexpected": unexpected,
                 "mismatched": mismatched}
