"""Test env: force CPU with 8 virtual devices so multi-chip sharding tests
run anywhere (standard JAX practice, SURVEY §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize may have imported jax before this file ran, latching
# JAX_PLATFORMS from the environment — override through the config API.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
