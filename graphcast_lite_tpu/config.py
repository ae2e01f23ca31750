"""Experiment configuration schema.

Field-compatible with the reference's pydantic models
(reference ``src/config.py``) so that reference ``config.json`` experiment
files can be ingested unchanged.  TPU-specific additions live in
``TpuConfig`` and are all optional with safe defaults.
"""

from __future__ import annotations

import json
from enum import Enum
from typing import List, Optional

from pydantic import BaseModel

__all__ = [
    "Grid2MeshEdgeCreation",
    "Mesh2GridEdgeCreation",
    "GraphLayerType",
    "ProductGraphType",
    "GraphBuildingConfig",
    "MLPBlock",
    "GATProps",
    "GraphBlock",
    "ModelConfig",
    "ProductGraphConfig",
    "PipelineConfig",
    "DataConfig",
    "TpuConfig",
    "ExperimentConfig",
    "load_experiment_config",
]


class Grid2MeshEdgeCreation(str, Enum):
    K_NEAREST = "k_nearest"
    RADIUS = "radius"


class Mesh2GridEdgeCreation(str, Enum):
    CONTAINED = "contained"


class GraphLayerType(str, Enum):
    ConvGCN = "conv_gcn"
    SimpleConv = "simple_conv"
    GATConv = "conv_gat"
    SparseGATConv = "sparse_gat"
    InteractionNet = "interaction_net"


class ProductGraphType(str, Enum):
    KRONECKER = "kronecker"
    CARTESIAN = "cartesian"
    STRONG = "strong"


class GraphBuildingConfig(BaseModel):
    grid2mesh_edge_creation: Grid2MeshEdgeCreation
    grid2mesh_radius_query: Optional[float] = None
    grid2mesh_k: Optional[int] = None
    mesh_levels: List[int]
    mesh2grid_edge_creation: Mesh2GridEdgeCreation


class MLPBlock(BaseModel):
    mlp_hidden_dims: Optional[List[int]] = None
    output_dim: int
    use_layer_norm: bool
    layer_norm_mode: Optional[str] = None


class GATProps(BaseModel):
    num_heads: int
    sparsity_thresholds: List[float]


class GraphBlock(BaseModel):
    layer_type: GraphLayerType
    gat_props: Optional[GATProps] = None
    hidden_dims: Optional[List[int]] = None
    output_dim: Optional[int] = None
    use_layer_norm: Optional[bool] = None
    layer_norm_mode: Optional[str] = None
    activation: Optional[str] = "prelu"
    num_message_passing_steps: Optional[int] = None
    edge_feature_dim: Optional[int] = None


class ModelConfig(BaseModel):
    mlp: Optional[MLPBlock] = None
    gcn: GraphBlock


class ProductGraphConfig(BaseModel):
    model: ModelConfig
    num_k: int
    self_loop: bool
    type: ProductGraphType


class PipelineConfig(BaseModel):
    product_graph: Optional[ProductGraphConfig] = None
    encoder: ModelConfig
    processor: ModelConfig
    decoder: ModelConfig


class DataConfig(BaseModel):
    dataset_name: str
    num_features_used: int
    obs_window_used: int
    pred_window_used: int
    want_feats_flattened: bool


class TpuConfig(BaseModel):
    """TPU-native runtime knobs (new to this framework)."""

    # Matmul / activation dtype for the compute path ("float32" | "bfloat16").
    compute_dtype: str = "float32"
    # Rematerialize each AR step during BPTT to bound HBM.
    remat_rollout: bool = True
    # Device mesh axis sizes; 1 means the axis is unused.
    data_parallel: int = 1
    spatial_parallel: int = 1
    # Donate rollout state buffers to XLA.
    donate_state: bool = True


class ExperimentConfig(BaseModel):
    batch_size: int = 1
    learning_rate: float = 1e-5
    early_stopping_patience: int = 10
    early_stopping_delta: float = 1e-4
    num_epochs: int = 100
    random_seed: Optional[int] = 42
    # graph/pipeline are optional only for the CNN (U-Net) stacks, which have
    # no graph; GNN experiments always set both (as reference configs do).
    graph: Optional[GraphBuildingConfig] = None
    pipeline: Optional[PipelineConfig] = None
    data: DataConfig
    wandb_log: bool = False
    wandb_name: Optional[str] = None
    wandb_key: Optional[str] = None
    use_latitude_weighting: bool = True
    max_ar_steps: int = 1
    data_dir: Optional[str] = None
    static_channels: List[int] = []
    forcing_channels: List[int] = []
    roi_only_loss: bool = False
    boundary_mask_width: int = 0
    freeze_processor_epochs: int = 0
    finetune_processor_lr_factor: float = 0.1
    use_residual: bool = True
    tpu: TpuConfig = TpuConfig()


def load_experiment_config(path: str) -> ExperimentConfig:
    """Load an experiment config.json (reference files ingest unchanged;
    unknown legacy keys like wandb credentials are tolerated)."""
    with open(path) as f:
        raw = json.load(f)
    raw.pop("wandb_key", None)  # never carry credentials forward
    return ExperimentConfig(**raw)
