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

# The axon TPU-tunnel site package force-sets jax_platforms="axon,cpu" at jax
# import time, overriding the env var; push it back to pure CPU for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
