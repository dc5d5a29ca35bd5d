"""Test env: force an 8-device CPU platform.

The container's sitecustomize registers the experimental `axon` TPU backend
and pins JAX_PLATFORMS=axon at interpreter start, so the env var alone is not
enough — we must also flip the already-imported jax config before any backend
is initialised. Multi-chip sharding logic is validated on a virtual CPU mesh;
the driver separately dry-runs the multi-chip path, and bench.py uses the real
TPU chip.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
