"""Test configuration: force an 8-device virtual CPU mesh.

The reference has no simulated multi-device testing (SURVEY.md §4); we test
all sharding logic on a virtual CPU mesh so `pjit`/`shard_map` paths are
exercised without TPU pods.

Must run before jax is imported anywhere.
"""
import os

# Force CPU: the host environment may pre-set JAX_PLATFORMS to a TPU
# platform AND pre-import jax via sitecustomize (so env vars alone are too
# late) — unit tests must run on the virtual 8-device CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}")
