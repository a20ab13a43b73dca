"""Test harness: force JAX onto a virtual 8-device CPU backend so pjit /
all-gather collectives and the data-parallel loss are exercised without TPUs
(SURVEY.md §4's strategy).  Must run before jax initializes a backend."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_hdf5(tmp_path_factory):
    """Synthetic BIOSCAN-style split HDF5 fixture (DATA.md schema)."""
    from tests.fixtures import make_tiny_bioscan_hdf5

    path = tmp_path_factory.mktemp("data") / "tiny_bioscan.hdf5"
    make_tiny_bioscan_hdf5(str(path))
    return str(path)
