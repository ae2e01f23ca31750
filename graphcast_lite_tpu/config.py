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
    "GridExperimentConfig",
    "is_grid_config",
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
    # In the reference this is a REQUIRED pydantic field (src/config.py:113,
    # no default — demo_low's misspelled `use_layzer_norm` would fail its
    # validation).  We default it False for ergonomics and normalize the
    # known `use_layzer_norm` typo during ingestion (load_experiment_config)
    # so that config's clear intent (LN on) is honored.
    use_layer_norm: bool = False
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


class GridExperimentConfig(BaseModel):
    """The reference's CNN-stack config schema — the flat ``config.json``
    read by its U-Net trainers (reference src/unet/main.py, main_v2.py) and
    downscaler trainer (reference scripts/train_downscaler.py).  Routed to
    the GridImageModel/Trainer path (cli/train_unet.py, cli/train_downscaler
    .py) via ``to_experiment_config``."""

    data_dir: Optional[str] = None
    num_features: int
    obs_window: int = 2
    pred_steps: int = 4
    batch_size: int = 16
    learning_rate: float = 1e-3
    num_epochs: int = 50
    patience: int = 10
    base_filters: int = 64
    max_ar_steps: int = 4
    # V2 extras (reference src/unet/main_v2.py / train_downscaler.py)
    attn_heads: int = 4
    spectral_modes: int = 4
    spectral_weight: float = 0.0
    gradient_weight: float = 0.0
    static_channels: List[int] = []
    forcing_channels: List[int] = []
    random_seed: Optional[int] = 42
    static_context: bool = False
    residual: bool = True
    gnn_input: bool = False
    input_noise: float = 0.0
    augment_flip: bool = False
    notes: Optional[str] = None

    def to_experiment_config(self) -> "ExperimentConfig":
        """Build the unified ExperimentConfig the shared Trainer consumes
        (graph/pipeline absent — CNN stacks have no graph)."""
        return ExperimentConfig(
            batch_size=self.batch_size,
            learning_rate=self.learning_rate,
            num_epochs=self.num_epochs,
            early_stopping_patience=self.patience,
            random_seed=self.random_seed,
            max_ar_steps=self.max_ar_steps,
            static_channels=self.static_channels,
            forcing_channels=self.forcing_channels,
            use_residual=self.residual,
            data_dir=self.data_dir,
            data=DataConfig(
                dataset_name="unet",
                num_features_used=self.num_features,
                obs_window_used=self.obs_window,
                pred_window_used=max(self.pred_steps, 1),
                want_feats_flattened=True,
            ),
        )


def is_grid_config(raw: dict) -> bool:
    """True for the reference's flat CNN schema (no pipeline/data blocks)."""
    return "pipeline" not in raw and "data" not in raw and (
        "base_filters" in raw or "num_features" in raw
    )


def load_experiment_config(path: str):
    """Load an experiment config.json (reference files ingest unchanged;
    unknown legacy keys like wandb credentials are tolerated).

    Returns an ``ExperimentConfig`` for GNN experiments and a
    ``GridExperimentConfig`` for the reference's flat U-Net/downscaler
    schema (all 27 reference ``experiments/*/config.json`` files construct
    a runnable config — tests/test_config_ingestion.py)."""
    with open(path) as f:
        raw = json.load(f)
    raw.pop("wandb_key", None)  # never carry credentials forward
    _normalize_typos(raw)
    if is_grid_config(raw):
        return GridExperimentConfig(**raw)
    return ExperimentConfig(**raw)


def _normalize_typos(node) -> None:
    """Fix known key typos from reference experiment files in place
    (demo_low/config.json writes `use_layzer_norm: true`; silently
    defaulting LN off would change that model's architecture)."""
    if isinstance(node, dict):
        if "use_layzer_norm" in node and "use_layer_norm" not in node:
            node["use_layer_norm"] = node.pop("use_layzer_norm")
        for v in node.values():
            _normalize_typos(v)
    elif isinstance(node, list):
        for v in node:
            _normalize_typos(v)
