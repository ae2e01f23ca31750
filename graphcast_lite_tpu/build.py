"""Model/graph construction from an ExperimentConfig + dataset metadata.

The equivalent of reference ``src/main.py:load_model_from_experiment_config``
(:36-69) plus the regional auto-detection logic of ``run_experiment``
(:146-165): when the dataset's lat/lon span is below 90° the mesh hierarchy
is pruned to the region before graph building.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .config import ExperimentConfig
from .data.dataset import DatasetMetadata
from .graphs.build import GraphSet, build_graph_set
from .models.weather import ModelGraphs, WeatherModel

__all__ = ["detect_region_bounds", "build_weather_model",
           "config_direct_steps"]


def config_direct_steps(cfg: ExperimentConfig) -> int:
    """P for DIRECT multi-step models — configs whose decoder emits P·C
    channels in one forward (reference wb2_64x32_15f_4pred: decoder
    output_dim 60 = 4·15) — else 1.  Mirrors the reference's runtime
    detection (src/assimilation/nudging.py:145: model output channels ==
    P·C), but statically from the config pipeline."""
    if getattr(cfg, "pipeline", None) is None \
            or getattr(cfg, "data", None) is None:
        return 1   # U-Net/grid configs carry no GNN pipeline
    from .models.weather import model_output_dim

    c = cfg.data.num_features_used
    static = 6
    if cfg.pipeline.product_graph is not None:
        enc_in = c + static
    else:
        enc_in = c * cfg.data.obs_window_used + static
    dec_in = model_output_dim(
        cfg.pipeline.processor,
        model_output_dim(cfg.pipeline.encoder, enc_in),
    )
    dec_out = model_output_dim(cfg.pipeline.decoder, dec_in)
    if dec_out > c and dec_out % c == 0:
        return dec_out // c
    return 1


def detect_region_bounds(
    meta: DatasetMetadata, span_threshold_deg: float = 90.0
) -> Optional[Tuple[float, float, float, float]]:
    """(lat_min, lat_max, lon_min, lon_max) if the grid covers a region
    smaller than `span_threshold_deg` in both axes, else None."""
    if meta.coordinates is None:
        return None
    lats, lons = meta.coordinates
    lat_span = float(lats.max() - lats.min())
    lon_span = float(lons.max() - lons.min())
    if lat_span < span_threshold_deg and lon_span < span_threshold_deg:
        return (
            float(lats.min()), float(lats.max()),
            float(lons.min()), float(lons.max()),
        )
    return None


def build_weather_model(
    cfg: ExperimentConfig,
    meta: DatasetMetadata,
    mesh_buffer_deg: float = 15.0,
    region_bounds: Optional[Tuple[float, float, float, float]] = None,
    auto_region: bool = True,
) -> Tuple[WeatherModel, ModelGraphs, GraphSet]:
    """Build the WeatherModel + device graphs for a config/dataset pair."""
    assert cfg.graph is not None and cfg.pipeline is not None, (
        "GNN model construction requires graph+pipeline configs"
    )
    lats, lons = meta.coordinates
    if region_bounds is None and auto_region:
        region_bounds = detect_region_bounds(meta)

    gs = build_graph_set(
        np.asarray(lats), np.asarray(lons),
        cfg.graph.mesh_levels,
        cfg.graph.grid2mesh_radius_query,
        flat_grid=meta.flat_grid,
        region_bounds=region_bounds,
        mesh_buffer_deg=mesh_buffer_deg,
    )
    graphs = ModelGraphs.from_graph_set(
        gs,
        product_config=cfg.pipeline.product_graph,
        obs_window=cfg.data.obs_window_used,
    )
    model = WeatherModel(
        pipeline=cfg.pipeline,
        data=cfg.data,
        num_grid_nodes=gs.num_grid_nodes,
        num_mesh_nodes=gs.num_mesh_nodes,
    )
    return model, graphs, gs
