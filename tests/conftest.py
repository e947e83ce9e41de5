"""Test harness: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are validated on CPU (no multi-chip TPU hardware
in CI); the driver separately compile-checks the TPU path.

Note: this machine's sitecustomize imports jax at interpreter startup, so
setting JAX_PLATFORMS via os.environ here is too late -- we must go through
jax.config (backends initialize lazily, after conftest runs).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
