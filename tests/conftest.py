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

# Persistent XLA compile cache: repeated suite runs skip recompiles (2-3x).
_cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
