"""Run setup-time computation on the host CPU backend.

Remote/tunnelled TPU runtimes (axon) pay multi-second -- occasionally
multi-minute -- remote-compile latency per program.  Setup-time work
(model linearization, operator precomputes) is tiny math that only happens
once, so it runs on the local CPU backend and ships the resulting arrays;
only the hot loop compiles for the accelerator.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax


def cpu_device():
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return jax.local_devices()[0]


@contextmanager
def on_cpu():
    """Context: computations default to the CPU backend."""
    with jax.default_device(cpu_device()):
        yield


def to_default(tree):
    """Move a pytree of arrays to the default (accelerator) device.

    Uses the first ADDRESSABLE device: under jax.distributed,
    jax.devices()[0] can belong to another process and device_put onto
    it fails with "non-addressable device"."""
    dev = jax.local_devices()[0]
    return jax.tree.map(lambda a: jax.device_put(a, dev), tree)
