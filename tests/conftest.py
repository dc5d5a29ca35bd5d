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


# ---- test tiering (VERDICT r03 #8) -----------------------------------------
# Default tier targets <5 min wall on the 8-device CPU mesh; the slow tier
# (multi-process distributed, Pallas-vs-XLA kernel equivalence in interpret
# mode, full pipeline sweeps — ~18 min extra) runs with --slow or RUN_SLOW=1.
# Run the FULL suite before any perf/parity claim: RUN_SLOW=1 pytest tests/ -q
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--slow", action="store_true", default=False,
                     help="include the slow tier (also: RUN_SLOW=1)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running tier, included with --slow/RUN_SLOW=1")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow") or os.environ.get("RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow tier (--slow / RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
