"""Test config: force an 8-device virtual CPU mesh before JAX backends init.

The container's sitecustomize pre-imports JAX and pins JAX_PLATFORMS to the
axon TPU tunnel, so env vars set here are too late — but backends resolve
lazily, so jax.config.update still wins. This makes the suite hermetic: all
tests (including multi-chip sharding tests) run on a virtual 8-device CPU
mesh with no TPU required.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
