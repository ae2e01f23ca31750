"""Acquisition ETL transform cores (VERDICT r4 Missing #1 / task 2):
the WB2/ARCO/CDS builders' full transform pipeline — variable catalog
mapping, per-channel float16-memmap streaming, Welford scalers,
progress.json resume — driven offline through an injected xarray-like
fake.  Proves:

* WB2Source maps surface/static/plev/tp variables and shapes correctly;
* stream_build_dataset produces the artifact set format-identical to
  data.synthetic (loads through ChunkedTimeseriesDataset, same keys);
* interrupt + resume is bit-identical to a clean build and re-streams
  only the rolled-back chunk;
* RegionSource bbox cuts match slicing the dense array;
* the 64x32, 512x256-style, ARCO-region and CDS-region shapes all build.
"""

import json
import os

import numpy as np
import pytest

from graphcast_lite_tpu.data.remote import (
    CANONICAL_19_VARIABLES,
    SCALE_FACTORS,
    RegionSource,
    WB2Source,
    build_dataset_512x256,
    build_dataset_wb2,
    build_region_arco,
    build_region_cds,
    stream_build_dataset,
)


# --------------------------------------------------------- fake xarray layer
class FakeDataArray:
    """The xarray.DataArray subset the builders touch."""

    def __init__(self, values, dims, coords):
        self.values = values
        self.dims = tuple(dims)
        self.coords = coords           # {name: np.ndarray}
        self.sizes = {d: values.shape[i] for i, d in enumerate(self.dims)}

    def __getattr__(self, name):
        if name in self.coords:
            return FakeDataArray(self.coords[name], (name,), {})
        raise AttributeError(name)

    def sel(self, level=None, **kw):
        assert level is not None and "level" in self.dims
        li = list(self.coords["level"]).index(level)
        ax = self.dims.index("level")
        vals = np.take(self.values, li, axis=ax)
        dims = tuple(d for d in self.dims if d != "level")
        coords = {k: v for k, v in self.coords.items() if k != "level"}
        return FakeDataArray(vals, dims, coords)

    def isel(self, time=None):
        assert time is not None and "time" in self.dims
        ax = self.dims.index("time")
        vals = np.take(self.values, np.arange(*time.indices(
            self.values.shape[ax])), axis=ax)
        coords = dict(self.coords)
        if "time" in coords:
            coords["time"] = coords["time"][time]
        return FakeDataArray(vals, self.dims, coords)

    def transpose(self, *dims):
        perm = [self.dims.index(d) for d in dims]
        return FakeDataArray(self.values.transpose(perm), dims, self.coords)


class FakeDataset:
    def __init__(self, arrays):
        self.data_vars = arrays        # dict name -> FakeDataArray

    def __getitem__(self, name):
        return self.data_vars[name]


def make_fake_wb2(n_time=12, n_lat=8, n_lon=16, seed=0, with_sp_tcwv=True,
                  tp_name="total_precipitation_6hr"):
    """Synthetic ERA5-like dataset with the WB2 variable names."""
    rng = np.random.RandomState(seed)
    lat = np.linspace(-87, 87, n_lat).astype(np.float32)
    lon = np.arange(0, 360, 360.0 / n_lon).astype(np.float32)
    time = np.arange(n_time)
    c_t = {"time": time, "latitude": lat, "longitude": lon}

    def surf(scale=1.0, off=0.0):
        return FakeDataArray(
            (off + scale * rng.randn(n_time, n_lat, n_lon)).astype(
                np.float32),
            ("time", "latitude", "longitude"), c_t)

    arrays = {
        "2m_temperature": surf(10, 280),
        "10m_u_component_of_wind": surf(5),
        "10m_v_component_of_wind": surf(5),
        "mean_sea_level_pressure": surf(500, 101325),
        tp_name: surf(0.001, 0.001),
    }
    if with_sp_tcwv:
        arrays["surface_pressure"] = surf(800, 98000)
        arrays["total_column_water_vapour"] = surf(5, 20)
    # Statics: no time dim.
    arrays["geopotential_at_surface"] = FakeDataArray(
        (rng.randn(n_lat, n_lon) * 1000 + 3000).astype(np.float32),
        ("latitude", "longitude"), {"latitude": lat, "longitude": lon})
    arrays["land_sea_mask"] = FakeDataArray(
        (rng.rand(n_lat, n_lon) > 0.5).astype(np.float32),
        ("latitude", "longitude"), {"latitude": lat, "longitude": lon})
    # Pressure-level vars.
    levels = np.array([1000, 850, 500, 200])
    c_l = {"time": time, "level": levels, "latitude": lat, "longitude": lon}
    for v, scale, off in [("temperature", 10, 260),
                          ("u_component_of_wind", 8, 0),
                          ("v_component_of_wind", 8, 0),
                          ("geopotential", 2000, 50000),
                          ("specific_humidity", 0.002, 0.004)]:
        arrays[v] = FakeDataArray(
            (off + scale * rng.randn(n_time, len(levels), n_lat,
                                     n_lon)).astype(np.float32),
            ("time", "level", "latitude", "longitude"), c_l)
    return FakeDataset(arrays)


# ------------------------------------------------------------------- tests
def test_wb2_source_catalog_mapping():
    ds = make_fake_wb2()
    src = WB2Source(ds)
    assert src.channels == CANONICAL_19_VARIABLES   # everything resolves
    assert src.n_time == 12
    slab = src.read("t2m", 2, 5)
    assert slab.shape == (3, 16, 8)                 # [T, lon, lat]
    # Value identity vs the raw array (transposed).
    raw = ds["2m_temperature"].values[2:5].transpose(0, 2, 1)
    np.testing.assert_allclose(slab, raw)
    # Plev: level selection.
    t850 = src.read("t@850", 0, 2)
    raw850 = ds["temperature"].values[0:2, 1].transpose(0, 2, 1)
    np.testing.assert_allclose(t850, raw850)
    # Static expansion along time.
    zs = src.read("z_surf", 3, 7)
    assert zs.shape == (4, 16, 8)
    np.testing.assert_allclose(zs[0], zs[3])

    # tp name detection across candidates.
    ds2 = make_fake_wb2(tp_name="total_precipitation")
    assert "tp" in WB2Source(ds2).channels
    # Missing variables are skipped with a warning, not fatal.
    ds3 = make_fake_wb2(with_sp_tcwv=False)
    ch = WB2Source(ds3).channels
    assert "sp" not in ch and "tcwv" not in ch and "t2m" in ch


def test_stream_build_format_identity(tmp_path):
    """The built artifact set loads exactly like data.synthetic's output."""
    from graphcast_lite_tpu.data.dataset import load_chunked_datasets

    ds = make_fake_wb2()
    out = str(tmp_path / "wb2")
    build_dataset_wb2(out, open_fn=lambda url, t0, t1: ds, time_chunk=5,
                      time_start="2010-01-01", time_end="2010-01-03")

    for name in ("data.npy", "dataset_info.json", "scalers.npz",
                 "coords.npz", "variables.json"):
        assert os.path.exists(os.path.join(out, name)), name
    assert not os.path.exists(os.path.join(out, "progress.json"))

    with open(os.path.join(out, "dataset_info.json")) as f:
        info = json.load(f)
    assert (info["n_time"], info["n_lon"], info["n_lat"],
            info["n_feat"]) == (12, 16, 8, 19)

    # Scale factors applied before the float16 cast (msl Pa -> hPa).
    mm = np.memmap(os.path.join(out, "data.npy"), np.float16, "r",
                   shape=(12, 16, 8, 19))
    msl = np.asarray(mm[:, :, :, 3], np.float32)
    assert 900 < msl.mean() < 1100      # hPa, not Pa (would overflow f16)
    z850 = np.asarray(mm[:, :, :, 12], np.float32)
    assert abs(z850.mean() - 50000 / 9.80665) < 1500   # meters

    # Loads through the standard dataset loader (format identity).
    train, val, test, meta = load_chunked_datasets(
        out, obs_window=2, pred_steps=2, n_features=19)
    x, y = train.get(0)
    assert x.shape == (8 * 16, 2 * 19) and y.shape == (8 * 16, 2 * 19)
    scl = np.load(os.path.join(out, "scalers.npz"))
    assert scl["mean"].shape == (19,) and (scl["std"] > 0).all()


class FlakySource:
    """ChannelSource wrapper that fails once at a given chunk start —
    the interrupted-download simulation."""

    def __init__(self, base, fail_at_t0):
        self.base = base
        self.fail_at = fail_at_t0
        self.read_log = []
        self.n_time = base.n_time
        self.latitude, self.longitude = base.latitude, base.longitude
        self.channels = base.channels

    def read(self, name, t0, t1):
        if self.fail_at is not None and t0 >= self.fail_at:
            raise ConnectionError("synthetic network failure")
        self.read_log.append((name, t0, t1))
        return self.base.read(name, t0, t1)


def test_resume_bit_identical(tmp_path):
    ds = make_fake_wb2()
    base = WB2Source(ds)

    clean_dir = str(tmp_path / "clean")
    stream_build_dataset(base, clean_dir, time_chunk=4)

    # Interrupted build: chunks [0,4) and [4,8) complete, [8,12) fails.
    flaky_dir = str(tmp_path / "flaky")
    flaky = FlakySource(base, fail_at_t0=8)
    with pytest.raises(ConnectionError):
        stream_build_dataset(flaky, flaky_dir, time_chunk=4)
    with open(os.path.join(flaky_dir, "progress.json")) as f:
        assert json.load(f)["last_completed_timestep"] == 8

    # Resume: rolls back ONE chunk (re-streams [4,8)), then finishes.
    flaky.fail_at = None
    flaky.read_log.clear()
    stream_build_dataset(flaky, flaky_dir, time_chunk=4, resume=True)
    streamed_t0 = sorted({t0 for _, t0, _ in flaky.read_log})
    assert streamed_t0 == [4, 8]       # prefix [0,4) NOT re-read

    # Bit-identical data; scalers match up to the float16 quantization of
    # the prefix whose stats are recomputed FROM DISK on resume (the
    # reference has the same asymmetry, build_dataset_512x256.py:235-247).
    a = np.memmap(os.path.join(clean_dir, "data.npy"), np.float16, "r")
    b = np.memmap(os.path.join(flaky_dir, "data.npy"), np.float16, "r")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    sa = np.load(os.path.join(clean_dir, "scalers.npz"))
    sb = np.load(os.path.join(flaky_dir, "scalers.npz"))
    np.testing.assert_allclose(sa["mean"], sb["mean"], rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(sa["std"], sb["std"], rtol=2e-3)
    assert not os.path.exists(os.path.join(flaky_dir, "progress.json"))


def test_region_source_cut(tmp_path):
    ds = make_fake_wb2(n_lat=16, n_lon=32)
    base = WB2Source(ds)
    region = RegionSource(base, 20.0, 70.0, 60.0, 120.0)
    assert (region.latitude >= 20).all() and (region.latitude <= 70).all()
    assert (region.longitude >= 60).all() and (region.longitude <= 120).all()
    slab = region.read("t2m", 0, 3)
    full = base.read("t2m", 0, 3)
    lat_idx = np.flatnonzero((base.latitude >= 20) & (base.latitude <= 70))
    lon_idx = np.flatnonzero((base.longitude >= 60) &
                             (base.longitude <= 120))
    np.testing.assert_allclose(
        slab, full[:, lon_idx][:, :, lat_idx])

    with pytest.raises(ValueError):
        RegionSource(base, 89.0, 89.5, 0.0, 1.0)   # empty cut


def test_all_builder_shapes(tmp_path):
    """64x32 / 512x256-style / ARCO-region / CDS-region builders run
    against the fake store and emit consistent grids."""
    ds = make_fake_wb2(n_lat=16, n_lon=32)

    d1 = build_dataset_wb2(str(tmp_path / "a"),
                           open_fn=lambda u, t0, t1: ds, time_chunk=6)
    d2 = build_dataset_512x256(str(tmp_path / "b"),
                               open_fn=lambda u, t0, t1: ds, time_chunk=6)
    d3 = build_region_arco(str(tmp_path / "c"), (20, 70, 60, 120),
                           open_fn=lambda a, t0, t1: ds)
    d4 = build_region_cds(str(tmp_path / "d"), (20, 70, 60, 120),
                          open_fn=lambda paths: ds)
    for d in (d1, d2):
        with open(os.path.join(d, "dataset_info.json")) as f:
            info = json.load(f)
        assert (info["n_lon"], info["n_lat"]) == (32, 16)
    for d in (d3, d4):
        with open(os.path.join(d, "dataset_info.json")) as f:
            info = json.load(f)
        assert info["n_lon"] < 32 and info["n_lat"] < 16
        c = np.load(os.path.join(d, "coords.npz"))
        assert (c["latitude"] >= 20).all() and (c["latitude"] <= 70).all()


def test_cli_subcommands(tmp_path, monkeypatch):
    """`python -m graphcast_lite_tpu.data.remote build-wb2 ...` parses and
    dispatches; with the network opener stubbed it completes end-to-end."""
    import graphcast_lite_tpu.data.remote as remote

    ds = make_fake_wb2()
    monkeypatch.setattr(remote, "open_wb2", lambda url, t0, t1: ds)
    out = str(tmp_path / "cli")
    rc = remote.main(["build-wb2", "--out", out, "--time-chunk", "5"])
    assert rc == 0 and os.path.exists(os.path.join(out, "data.npy"))

    # Zero-egress behavior: the gated opener raises with a clear message.
    monkeypatch.undo()
    try:
        import xarray  # noqa: F401
        import gcsfs  # noqa: F401
        has_deps = True
    except ImportError:
        has_deps = False
    if not has_deps:
        with pytest.raises(RuntimeError, match="zero-egress"):
            remote.main(["build-wb2", "--out", str(tmp_path / "x")])


def make_fake_cds(n_time=8, n_lat=12, n_lon=16, seed=1):
    """CDS-style netcdf: ERA5 SHORT variable names (t2m/u10/...), plev vars
    carrying a level dim."""
    rng = np.random.RandomState(seed)
    lat = np.linspace(40, 65, n_lat).astype(np.float32)
    lon = np.linspace(60, 110, n_lon).astype(np.float32)
    time = np.arange(n_time)
    c_t = {"time": time, "latitude": lat, "longitude": lon}

    def surf(scale=1.0, off=0.0):
        return FakeDataArray(
            (off + scale * rng.randn(n_time, n_lat, n_lon)).astype(
                np.float32),
            ("time", "latitude", "longitude"), c_t)

    levels = np.array([850, 500])
    c_l = {"time": time, "level": levels, "latitude": lat, "longitude": lon}

    def plev(scale, off):
        return FakeDataArray(
            (off + scale * rng.randn(n_time, len(levels), n_lat,
                                     n_lon)).astype(np.float32),
            ("time", "level", "latitude", "longitude"), c_l)

    return FakeDataset({
        "t2m": surf(10, 280), "u10": surf(5), "v10": surf(5),
        "msl": surf(500, 101325), "sp": surf(800, 98000),
        "tp": surf(0.001, 0.001),
        "t": plev(10, 260), "z": plev(2000, 50000), "q": plev(0.002, 0.004),
    })


def test_cds_short_name_catalog(tmp_path):
    """The CDS builder path resolves ERA5 SHORT names (cdsapi downloads);
    ambiguous 'z' (static vs plev) must go to the pressure levels when it
    carries a level dim."""
    ds = make_fake_cds()
    src = WB2Source(ds)
    assert "t2m" in src.channels and "10u" in src.channels
    assert "t@850" in src.channels and "z@500" in src.channels
    assert "z_surf" not in src.channels      # plev 'z' is not the static
    np.testing.assert_allclose(
        src.read("10u", 0, 2),
        ds["u10"].values[:2].transpose(0, 2, 1))

    out = build_region_cds(str(tmp_path / "cds"), (45, 60, 70, 100),
                           open_fn=lambda paths: ds)
    with open(os.path.join(out, "dataset_info.json")) as f:
        info = json.load(f)
    assert info["n_feat"] == len(src.channels)

    # Garbage source -> explicit error, not IndexError.
    with pytest.raises(ValueError, match="none of the requested"):
        WB2Source(FakeDataset({"foo": ds["t2m"]}))
