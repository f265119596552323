"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh
(xla_force_host_platform_device_count=8); the real-TPU path is exercised by
bench.py and the driver's compile checks.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # env presets axon (TPU); tests want the virtual-device CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon TPU-tunnel site package force-sets jax_platforms="axon,cpu" at jax
# import time, overriding the env var; push it back to pure CPU for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Fast tier (`pytest -m smoke`, < 2 min): helper/contract/builder parity
# tests with no heavy field-kernel compiles. Everything else is the full
# suite (~20 min, CI "full" job).
_SMOKE_MODULES = {
    "test_builder",
    "test_codegen_cli",
    "test_contracts_registry_flows",
    "test_contracts_scripts",
    "test_helpers_pipeline",
    "test_helpers_tools",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__ in _SMOKE_MODULES:
            item.add_marker(pytest.mark.smoke)


def pytest_configure(config):
    config.addinivalue_line("markers", "smoke: fast tier, runs in under 2 minutes")
    config.addinivalue_line("markers", "slow: multi-minute tests (sharded prove compiles)")
