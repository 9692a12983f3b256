"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; JAX's host-platform
device-count override gives the same pjit/shard_map code paths on CPU.

Note: this image's sitecustomize registers a remote-TPU PJRT plugin and
hard-sets jax_platforms="axon,cpu" at interpreter start, so the env var
alone is not enough — we must rewrite the config before the first
backend initialization. The remote TPU serializes clients, so letting a
test grab it both slows the suite ~100x and blocks other processes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # undo sitecustomize's "axon,cpu"
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", jax.devices()


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (multi-minute mesh/e2e suites)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute suite, skipped by default "
        "(run with --runslow; always run before snapshots)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    import pytest

    skip = pytest.mark.skip(reason="slow: use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
