"""Test fixtures. Backend forcing (CPU, 8 virtual devices) lives in the ROOT
conftest.py so it runs before any jax backend initialization."""

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)


@pytest.fixture(scope="session")
def tmp_root(tmp_path_factory):
    return tmp_path_factory.mktemp("runs")
