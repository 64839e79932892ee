"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

This lets multi-chip sharding tests (jax.sharding.Mesh over 8 devices) run
on any host without TPU hardware.
"""
import os

# Force CPU even when the environment pre-sets a TPU platform: the test
# suite must run hermetically on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
