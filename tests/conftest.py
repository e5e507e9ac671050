"""Test harness config: run JAX on CPU with 8 virtual devices.

Multi-chip sharding paths are validated on a virtual CPU mesh
(xla_force_host_platform_device_count), matching how the driver
dry-runs the multi-chip program. Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env ships JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter start, overriding the env var — undo it
# before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"
