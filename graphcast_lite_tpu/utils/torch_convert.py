"""Convert reference PyTorch checkpoints into this framework's params.

The reference trains ``WeatherPrediction`` (torch/PyG) and saves
``best_model.pth`` / ``checkpoint.pth`` state dicts (reference
src/train.py:22-49,496).  This module maps those tensors onto the flax
parameter pytree of ``models.weather.WeatherModel`` so converted weights
reproduce the reference model's outputs (the graphs are deterministic, the
layers are numerics-parity implementations — see tests/test_gnn_parity.py).

Key layout differences handled here:
  * torch Linear stores weight [out, in]  -> kernel [in, out] (transposed);
  * PyG GATConv stores lin [H*C, in] + att_src/att_dst [1, H, C];
  * the InteractionNet processor's N unshared step modules are STACKED along
    a leading axis here (nn.scan) instead of ModuleList entries step_i;
  * PReLU single-slope tensors map 1:1; PyG LayerNorm weight/bias map 1:1.

Loading uses ``torch.load(map_location='cpu')`` when torch is available and
falls back to reading a NumPy ``.npz`` export of the same state dict.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from ..config import ExperimentConfig, GraphLayerType, MLPBlock, ModelConfig

__all__ = ["load_torch_state_dict", "convert_reference_checkpoint"]


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth/.pt state dict (or an .npz export) -> numpy dict."""
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(blob, dict) and "model_state_dict" in blob:
        blob = blob["model_state_dict"]
    return {k: v.detach().numpy() for k, v in blob.items()
            if hasattr(v, "detach")}


def _lin(sd, prefix):
    out = {"kernel": sd[f"{prefix}.weight"].T.astype(np.float32)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"].astype(np.float32)
    return out


def _prelu(sd, key):
    return {"alpha": sd[key].reshape(1).astype(np.float32)}


def _ln(sd, prefix):
    return {
        "weight": sd[f"{prefix}.weight"].astype(np.float32),
        "bias": sd[f"{prefix}.bias"].astype(np.float32),
    }


def _mlp_tower(sd, prefix, mlp_cfg: MLPBlock) -> Dict[str, Any]:
    """Reference MLP is an nn.ModuleList: Linear, PReLU, Linear, PReLU, ...,
    Linear[, LayerNorm] under ``{prefix}.MLP.{i}``."""
    hidden = list(mlp_cfg.mlp_hidden_dims or [])
    out: Dict[str, Any] = {}
    idx = 0
    for i in range(len(hidden)):
        out[f"lin_{i}"] = _lin(sd, f"{prefix}.MLP.{idx}")
        out[f"prelu_{i}"] = _prelu(sd, f"{prefix}.MLP.{idx + 1}.weight")
        idx += 2
    out[f"lin_{len(hidden)}"] = _lin(sd, f"{prefix}.MLP.{idx}")
    idx += 1
    if mlp_cfg.use_layer_norm:
        out["norm"] = _ln(sd, f"{prefix}.MLP.{idx}")
    return out


def _gcn_conv(sd, prefix):
    return {
        "kernel": sd[f"{prefix}.lin.weight"].T.astype(np.float32),
        "bias": sd[f"{prefix}.bias"].astype(np.float32),
    }


def _gat_core(sd, prefix):
    core = {
        "kernel": sd[f"{prefix}.lin.weight"].T.astype(np.float32)
        if f"{prefix}.lin.weight" in sd
        else sd[f"{prefix}.lin_src.weight"].T.astype(np.float32),
        "att_src": sd[f"{prefix}.att_src"].astype(np.float32),
        "att_dst": sd[f"{prefix}.att_dst"].astype(np.float32),
    }
    if f"{prefix}.bias" in sd:
        core["bias"] = sd[f"{prefix}.bias"].astype(np.float32)
    return {"core": core}


def _two_layer_mlp(sd, prefix):
    """Reference nn.Sequential(Linear, act, Linear) -> lin_0/lin_1."""
    return {"lin_0": _lin(sd, f"{prefix}.0"), "lin_1": _lin(sd, f"{prefix}.2")}


def _stack(dicts: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack a list of identical pytrees along a new leading axis."""
    out: Dict[str, Any] = {}
    for key in dicts[0]:
        vals = [d[key] for d in dicts]
        if isinstance(vals[0], dict):
            out[key] = _stack(vals)
        else:
            out[key] = np.stack(vals)
    return out


def _interaction_processor(sd, prefix, num_steps: int) -> Dict[str, Any]:
    steps = []
    for i in range(num_steps):
        sp = f"{prefix}.steps.{i}"
        step = {
            "edge_mlp": _two_layer_mlp(sd, f"{sp}.edge_mlp"),
            "node_mlp": _two_layer_mlp(sd, f"{sp}.node_mlp"),
        }
        if f"{sp}.edge_norm.weight" in sd:
            step["edge_norm"] = _ln(sd, f"{sp}.edge_norm")
            step["node_norm"] = _ln(sd, f"{sp}.node_norm")
        steps.append(step)
    out = {
        "edge_encoder_lin": _lin(sd, f"{prefix}.edge_encoder.0"),
        "steps": {"layer": _stack(steps)},
    }
    return out


def _graph_layer(sd, prefix, cfg, input_dim) -> Dict[str, Any]:
    lt = cfg.gcn.layer_type
    if lt == GraphLayerType.SimpleConv:
        return {}
    out: Dict[str, Any] = {}
    if lt in (GraphLayerType.ConvGCN, GraphLayerType.GATConv):
        hidden = list(cfg.gcn.hidden_dims or [])
        n_layers = len(hidden) + 1
        # Reference interleaves convs with ONE shared activation module; conv
        # modules are layers.{0,2,4,...}; a trailing LayerNorm follows.
        conv_positions = [2 * i for i in range(n_layers)]
        shared_act_pos = 1
        for i, pos in enumerate(conv_positions):
            if lt == GraphLayerType.ConvGCN:
                out[f"conv_{i}"] = _gcn_conv(sd, f"{prefix}.layers.{pos}")
            else:
                out[f"conv_{i}"] = _gat_core(sd, f"{prefix}.layers.{pos}")
        act_key = f"{prefix}.layers.{shared_act_pos}.weight"
        if act_key in sd:
            out["act"] = _prelu(sd, act_key)
        if cfg.gcn.use_layer_norm:
            out["norm"] = _ln(sd, f"{prefix}.layers.{2 * n_layers}")
    elif lt == GraphLayerType.SparseGATConv:
        out["conv_0"] = _gat_core(sd, f"{prefix}.layers.0")
        if cfg.gcn.use_layer_norm:
            out["norm"] = _ln(sd, f"{prefix}.layers.1")
    elif lt == GraphLayerType.InteractionNet:
        out["inet"] = _interaction_processor(
            sd, f"{prefix}.layers", cfg.gcn.num_message_passing_steps or 4
        )
    return out


def _model_block(sd, prefix, cfg: ModelConfig, input_dim) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    if cfg.mlp is not None:
        out["mlp"] = _mlp_tower(sd, f"{prefix}.mlp", cfg.mlp)
    out["graph_layer"] = _graph_layer(sd, prefix, cfg, input_dim)
    return out


def convert_reference_checkpoint(
    state_dict: Dict[str, np.ndarray],
    cfg: ExperimentConfig,
) -> Dict[str, Any]:
    """Build the flax 'params' pytree for WeatherModel from a reference
    WeatherPrediction state dict."""
    pipeline = cfg.pipeline
    params: Dict[str, Any] = {
        "encoder": _model_block(state_dict, "encoder", pipeline.encoder, None),
        "processor": _model_block(
            state_dict, "processor", pipeline.processor, None
        ),
        "decoder": _model_block(state_dict, "decoder", pipeline.decoder, None),
    }
    if pipeline.product_graph is not None:
        params["product_model"] = _model_block(
            state_dict, "product_graph_model", pipeline.product_graph.model,
            None,
        )
    return {"params": params}
