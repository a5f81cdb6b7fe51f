"""Test configuration: run the whole suite on an emulated 8-device CPU mesh.

The reference had no pytest suite at all (SURVEY.md §4); we test every
kernel against numpy oracles and run multi-chip sharding tests via XLA's
host-platform device emulation. Env vars must be set before jax imports.
"""

import os

# Force CPU even if the surrounding environment points JAX at a TPU
# platform: the test suite needs an 8-device emulated mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep CPU matmuls deterministic-ish and fast in tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np
import pytest


def pytest_sessionstart(session):
    import jax

    assert jax.default_backend() == "cpu", "tests must run on emulated CPU"
    assert len(jax.devices()) == 8, "expected 8 emulated devices"


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def clustered_data():
    """Seeded clustered vectors — ANN-friendly data (uniform random vectors
    make recall targets meaningless in high dim). Mirrors the reference's
    seeded-synthetic fixture style (reference test_disk_write_verify.py:28-30)."""
    rng = np.random.default_rng(42)
    n_clusters, per, dim = 50, 40, 64
    centers = rng.normal(size=(n_clusters, dim)).astype(np.float32) * 5.0
    pts = (
        centers[:, None, :] + rng.normal(size=(n_clusters, per, dim)).astype(np.float32)
    ).reshape(-1, dim)
    perm = rng.permutation(len(pts))
    return pts[perm]
