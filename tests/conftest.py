import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware. Must be set before jax import.
# Force CPU even if the ambient environment points at a TPU (e.g. axon):
# unit tests must be fast, deterministic, and float32-exact.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The ambient sitecustomize registers an 'axon' TPU backend and pins
# JAX_PLATFORMS=axon; the env var alone is not enough — override the config.
jax.config.update("jax_platforms", "cpu")

# allow float64 golden tests on CPU (TPU path stays float32)
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run tests marked slow (multi-minute: golden flights, "
             "multihost, sharding equivalence, kernel parity)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(reason="slow; enable with --slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
