"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Mirrors the driver's multi-chip dry-run environment so sharding code paths
are exercised without TPU hardware.
"""

import os

# Must happen before jax import anywhere in the test process. Force (not
# setdefault): the environment pre-sets JAX_PLATFORMS to the TPU plugin.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
