"""Checkpoint / resume for built systems and simulation outputs.

The reference checkpoints only via .mat artifacts between workflow stages
(reference: README.md:266,294-295; SURVEY.md section 5.4).  Here any
pytree (the built System, scenario batches, telemetry) round-trips through
Orbax; static metadata (configs) goes alongside as JSON.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save(path: str, pytree: Any, config=None,
         overwrite: bool = False) -> None:
    """Save an array pytree (+ optional dataclass config) to ``path``.

    ``overwrite=True`` replaces an existing checkpoint atomically --
    the periodic-checkpoint pattern (benchmarks/montecarlo_100k.py
    persists per-chunk summaries + cursor after every chunk)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "arrays"),
                   jax.tree.map(np.asarray, pytree), force=overwrite)
    if config is not None:
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(config), f, indent=2, default=str)


def restore(path: str, like: Any) -> Any:
    """Restore a pytree saved by `save`, matching ``like``'s structure."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        target = jax.tree.map(np.asarray, like)
        restored = ckptr.restore(os.path.join(path, "arrays"), target)
    return jax.tree.map(jax.numpy.asarray, restored)


def load_config_dict(path: str) -> dict:
    with open(os.path.join(os.path.abspath(path), "config.json")) as f:
        return json.load(f)
