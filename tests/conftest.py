"""Test harness configuration.

Forces the CPU backend with 8 virtual devices so multi-chip sharding tests
run anywhere (the axon sitecustomize registers a remote-TPU backend at
interpreter start; the runtime config update below overrides it).  Matmul
precision is pinned to float32 so parity tolerances are meaningful.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def small_graph_set():
    """64x32 grid, mesh levels [1,2] — small but structurally complete."""
    from graphcast_lite_tpu.graphs.build import build_graph_set

    lat = np.linspace(-87.1875, 87.1875, 32).astype(np.float32)
    lon = np.arange(0, 360, 5.625).astype(np.float32)
    return build_graph_set(lat, lon, [1, 2], grid2mesh_radius_query=0.6)
