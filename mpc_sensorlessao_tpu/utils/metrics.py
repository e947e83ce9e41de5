"""Aggregate metrics over closed-loop telemetry.

Replaces the reference's ad-hoc accumulator arrays + figure plotting
(reference: README.md:420-427,588-624; SURVEY.md section 5.5) with typed
summaries computed on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LoopSummary(NamedTuple):
    """Settled closed-loop performance (time axis reduced)."""

    mean_rms_res: jnp.ndarray
    p95_rms_res: jnp.ndarray
    mean_rms_turb: jnp.ndarray
    rejection: jnp.ndarray        # mean_rms_turb / mean_rms_res
    mean_strehl: jnp.ndarray      # Marechal exp(-sigma^2)
    min_strehl: jnp.ndarray
    mean_strehl_exact: jnp.ndarray  # OTF-volume Strehl (imager.m:115)
    min_strehl_exact: jnp.ndarray
    mean_cost: jnp.ndarray
    max_abs_u: jnp.ndarray
    max_abs_du: jnp.ndarray
    max_abs_volts: jnp.ndarray


@jax.jit
def summarize(outputs, settle_fraction: float = 0.5) -> LoopSummary:
    """Reduce StepOutputs over the settled tail of the time axis.

    Works on (T, ...) single-scenario or (S, T, ...) batched outputs (the
    time axis is the one matching rms_res's last dim).
    """
    T = outputs.rms_res.shape[-1]
    s = int(T * settle_fraction)
    res = outputs.rms_res[..., s:]
    turb = outputs.rms_turb[..., s:]
    return LoopSummary(
        mean_rms_res=jnp.mean(res),
        p95_rms_res=jnp.percentile(res, 95),
        mean_rms_turb=jnp.mean(turb),
        rejection=jnp.mean(turb) / jnp.mean(res),
        mean_strehl=jnp.mean(outputs.strehl[..., s:]),
        min_strehl=jnp.min(outputs.strehl[..., s:]),
        # fall back to Marechal for hand-built fixtures without the
        # exact-Strehl channel
        mean_strehl_exact=jnp.mean(
            (outputs.strehl if outputs.strehl_exact is None
             else outputs.strehl_exact)[..., s:]),
        min_strehl_exact=jnp.min(
            (outputs.strehl if outputs.strehl_exact is None
             else outputs.strehl_exact)[..., s:]),
        mean_cost=jnp.mean(outputs.cost[..., s:]),
        max_abs_u=jnp.max(jnp.abs(outputs.u)),
        max_abs_du=jnp.max(jnp.abs(outputs.du)),
        max_abs_volts=jnp.max(jnp.abs(outputs.volts)),
    )


def to_dict(summary: LoopSummary) -> dict:
    return {k: float(v) for k, v in summary._asdict().items()}
