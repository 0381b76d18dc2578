"""Test env: force CPU with 8 virtual devices (multi-chip sharding tests run
on a faked mesh per SURVEY.md §4) regardless of the ambient TPU platform."""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "architectures"))


@pytest.fixture(scope="session")
def torch_reference():
    """Import the PyTorch reference package for runtime parity checks.

    Skips when the reference tree or torch is unavailable; parity is then
    covered by the golden-value tests only.
    """
    if not reference_available():
        pytest.skip("reference tree not available")
    torch = pytest.importorskip("torch")
    import sys

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    torch.manual_seed(0)
    return torch


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
