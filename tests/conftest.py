"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

This is the multi-chip-without-a-cluster trick the reference lacks
(SURVEY.md §4): sharding logic is exercised on a virtual CPU mesh.

NOTE: the env var JAX_PLATFORMS is ignored when the axon TPU plugin is
installed; `jax.config.update("jax_platforms", "cpu")` is what actually
forces the CPU backend here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
