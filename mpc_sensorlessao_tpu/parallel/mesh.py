"""Device-mesh construction for scenario-parallel Monte-Carlo scaling.

The reference has no distributed backend at all (SURVEY.md section 2: no
MPI/NCCL/Gloo; two shared-memory parfor loops).  The TPU-native equivalent
(SURVEY.md section 5.8) is a `jax.sharding.Mesh` over a pod slice with the
Monte-Carlo scenario axis sharded across chips and statistics reduced over
ICI collectives (`psum`).  Multi-host runs reuse the same code: under
`jax.distributed`, `jax.devices()` spans all hosts and the mesh axis rides
ICI within a slice / DCN across slices automatically.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SCENARIO_AXIS = "scenario"


def scenario_mesh(n_devices: int | None = None,
                  devices: Sequence | None = None) -> Mesh:
    """1-D mesh over the scenario (Monte-Carlo) axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SCENARIO_AXIS,))


def scenario_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for per-scenario arrays."""
    return NamedSharding(mesh, P(SCENARIO_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_devices(n: int, n_devices: int) -> int:
    """Smallest multiple of n_devices >= n (static shapes need even
    shards)."""
    return ((n + n_devices - 1) // n_devices) * n_devices
