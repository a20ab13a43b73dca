"""Test harness: force JAX onto a virtual 8-device CPU backend so pjit /
all-gather collectives and the data-parallel loss are exercised without TPUs
(SURVEY.md §4's strategy).

Note: the env-var route (JAX_PLATFORMS / XLA_FLAGS) is overridden by the
environment's TPU plugin, so the config API is used — it must run before any
backend is initialized (pytest imports conftest first)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# transformers probes-and-imports TensorFlow unless told not to — ~40 s of
# import time on this 1-CPU host, paid by whichever test touches HF first
os.environ.setdefault("USE_TF", "0")
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

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
