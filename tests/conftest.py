"""Test configuration: force CPU backend with 8 virtual devices.

The axon TPU plugin ignores the JAX_PLATFORMS env var, so we must also set
the config flag after import (before any backend initialization). conftest
is imported before any test module, so jax has not initialized yet.
"""

import os

os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
