"""Test configuration: force an 8-device CPU mesh so multi-chip sharding
paths compile and execute without TPU hardware (SURVEY.md §4.4 analog of
the reference's multi-thread commit-join stress tests)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize (tunneled TPU) registers its backend at
# interpreter startup and forces jax_platforms="axon,cpu"; tests must run
# on the host CPU (fast compiles, 8 virtual devices), so re-force cpu
# before any backend initialization.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0x5EED)


# Quick tier (VERDICT r4 #10): a <5-min correctness smoke covering every
# layer — API, builders, both traversal families, cBVH, subdiv, diff,
# dist — selected per-module. The full matrix stays for CI.
_QUICK_MODULES = {
    "test_api", "test_build", "test_intersect", "test_pluecker",
    "test_cbvh", "test_node_flavors", "test_subdiv", "test_diff",
    "test_filter", "test_mask_cull", "test_stats", "test_rtcore",
    "test_triangle_geometry", "test_user_builder", "test_rotate",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__ in _QUICK_MODULES:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """The full suite segfaults deterministically in XLA:CPU when one
    process accumulates ~250 compiled executables and then traces a
    large program (observed at test_rowtrace after the full alphabetical
    prefix; neither half of the suite alone reproduces it). Dropping
    compiled-program caches between modules keeps the client far from
    the cliff; intra-module reuse (the expensive fixtures) is kept."""
    yield
    import jax

    jax.clear_caches()
