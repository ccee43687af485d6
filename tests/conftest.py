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

# Persistent jit cache: the slow e2e tier re-compiles identical programs on
# every run (multi-minute on 1 CPU); caching them makes full-suite
# verification feasible on small boxes. Safe to delete the directory.
os.makedirs("/tmp/jax_test_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
