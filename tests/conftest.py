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
