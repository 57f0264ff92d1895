"""Test configuration: force CPU with 8 virtual devices (fake TPU mesh).

Must set env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize imports jax at interpreter startup (before
# this conftest runs), freezing jax_platforms from the env. Override via the
# config API, which works as long as no backend has been initialized yet.
import jax

jax.config.update("jax_platforms", "cpu")

import sys

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"


def _reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "articulatory"))


requires_reference = pytest.mark.skipif(
    not _reference_available(), reason="reference oracle repo not mounted")


@pytest.fixture(scope="session")
def reference():
    """Import the reference package (read-only oracle) with compat shims."""
    if not _reference_available():
        pytest.skip("reference repo not available")
    import scipy.signal
    import scipy.signal.windows
    if not hasattr(scipy.signal, "kaiser"):
        scipy.signal.kaiser = scipy.signal.windows.kaiser
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import articulatory  # noqa: F401
    return articulatory


@pytest.fixture
def rng():
    return np.random.default_rng(0)
