"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests run anywhere (SURVEY.md §4 rebuild test plan)."""

import os

# NOTE: the ambient environment exports JAX_PLATFORMS=axon (the real TPU
# tunnel) — override unconditionally, tests must run on the CPU mesh.
# A pytest plugin may import jax BEFORE this conftest runs, freezing the
# env-derived config default — so also update jax.config explicitly.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
