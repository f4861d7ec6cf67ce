"""Test configuration: force an 8-device virtual CPU platform so mesh /
sharding tests run without TPUs, and keep everything float32.

The ambient environment pins JAX_PLATFORMS=axon (a remote TPU tunnel)
via a sitecustomize hook that runs before this file, so the env var is
already consumed — override through jax.config instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
