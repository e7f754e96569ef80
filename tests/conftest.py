"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is validated on
XLA's host-platform virtual devices (SURVEY.md §4 "Multi-host without a cluster").
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Force CPU: the one real TPU chip is reserved for benchmarking, and TPU
# compiles (~30 s/shape) would dominate test time. The axon sitecustomize
# overrides the JAX_PLATFORMS env var programmatically, so the config must be
# updated after import. Set BRICKMAP_TEST_TPU=1 to opt in to real hardware.
if not os.environ.get("BRICKMAP_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng(request):
    """Per-test deterministic rng.

    Seeded from the test's nodeid (stable hash) so each test's random data
    is independent of execution order — a session-scoped stream made every
    added/filtered test shift later tests' rays, which surfaced
    tolerance-marginal failures that only reproduced in specific orders."""
    import zlib

    seed = zlib.crc32(request.node.nodeid.encode()) & 0xFFFFFFFF
    return np.random.default_rng(seed)


@pytest.fixture(scope="session")
def session_rng():
    """Shared stream for session-scoped fixtures (world builders)."""
    return np.random.default_rng(1234)
