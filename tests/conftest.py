"""Test configuration: force a virtual 8-device CPU mesh so data-parallel
sharding, psum metrics and per-host input sharding are CI-testable without a
TPU pod (closing the reference's biggest test gap, SURVEY.md §4)."""

import os

# Must be set before any jax import: the axon TPU plugin registers itself via
# sitecustomize whenever PALLAS_AXON_POOL_IPS is non-empty, overriding
# JAX_PLATFORMS=cpu. Blank it so tests run on a true host-CPU backend.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)


@pytest.fixture(scope="session")
def tmp_root(tmp_path_factory):
    return tmp_path_factory.mktemp("runs")
