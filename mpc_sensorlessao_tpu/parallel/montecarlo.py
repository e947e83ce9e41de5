"""Sharded Monte-Carlo closed-loop rollouts.

Implements BASELINE configs 4-5: thousands of parallel frozen-flow
scenarios (varying turbulence window, D/r0, SNR, noise realization) with
per-chip `vmap` batches, the scenario axis sharded over the device mesh via
`shard_map`, and Strehl/RMS statistics reduced with `psum` over ICI.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

shard_map = jax.shard_map

from ..models import closed_loop
from ..utils.config import SystemConfig, mag_conv
from .mesh import SCENARIO_AXIS


class ScenarioBatch(NamedTuple):
    """Per-scenario traced parameters (leading axis = scenario).

    start_step:  window offset into the periodic frozen-flow screens
                 (decorrelated turbulence per scenario);
    mag:         turbulence magnification (D/r0 sweep, README.md:277-284);
    noise_scale: multiplier on the SNR-defined noise std (SNR sweep);
    key:         per-scenario noise PRNG key.
    """

    start_step: jnp.ndarray
    mag: jnp.ndarray
    noise_scale: jnp.ndarray
    key: jnp.ndarray


class MonteCarloStats(NamedTuple):
    """psum-reduced aggregate statistics over all scenarios.

    Divergence containment (utils/guards.py's in-loop counterpart): a
    scenario whose settled telemetry is non-finite or whose residual
    exceeds ``DIVERGED_REJECTION_FLOOR`` x its own turbulence is counted
    in ``n_diverged`` and EXCLUDED from the means -- one blown-up
    scenario cannot poison a whole shard's psum the way a raw NaN mean
    would."""

    mean_rms_res: jnp.ndarray     # settled mean residual RMS [rad]
    mean_rms_turb: jnp.ndarray
    mean_strehl: jnp.ndarray      # Marechal
    mean_strehl_exact: jnp.ndarray  # OTF-volume (imager.m:115)
    max_rms_res: jnp.ndarray
    mean_cost: jnp.ndarray
    n_scenarios: jnp.ndarray
    n_diverged: jnp.ndarray = None


# a "settled" loop whose residual exceeds this multiple of the raw
# turbulence is injecting aberration, not correcting it
DIVERGED_REJECTION_FLOOR = 10.0


def make_scenarios(
    cfg: SystemConfig,
    key,
    n_scenarios: int,
    d_over_r0_grid=(5.0,),
    snr_db_grid=(10.0,),
    start_range=None,
) -> ScenarioBatch:
    """Sample a scenario batch over (noise, D/r0, SNR[, window]) axes.

    By default every scenario cold-starts at the test-split step like the
    reference loop (README.md:429-444) -- a cold start inside a strong
    turbulence patch is outside the phase-diversity estimator's capture
    range (physics, not implementation), so window sweeps are opt-in via
    ``start_range=(lo, hi)``.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    if start_range is None:
        s0 = cfg.sim.n_train + cfg.sim.n_valid
        start = jnp.full((n_scenarios,), float(s0), dtype=jnp.float32)
    else:
        start = jax.random.randint(
            k1, (n_scenarios,), start_range[0],
            max(start_range[1], start_range[0] + 1)).astype(jnp.float32)
    mags = jnp.asarray([mag_conv(d) for d in d_over_r0_grid],
                       dtype=jnp.float32)
    mag = mags[jax.random.randint(k2, (n_scenarios,), 0, len(mags))]
    # noise_scale = 10^((SNR_cfg - SNR_scenario)/20)
    scales = jnp.asarray(
        [10.0 ** ((cfg.estimator.snr_db - s) / 20.0) for s in snr_db_grid],
        dtype=jnp.float32)
    noise_scale = scales[jax.random.randint(k3, (n_scenarios,), 0,
                                            len(scales))]
    keys = jax.random.split(k4, n_scenarios)
    return ScenarioBatch(start_step=start, mag=mag,
                         noise_scale=noise_scale, key=keys)


def _settled_slice(n_steps: int) -> int:
    return max(n_steps // 2, 1)


def assert_shared_window(scen: ScenarioBatch) -> None:
    """Concrete-value check that every scenario shares one turbulence
    window.  Call OUTSIDE jit, then pass ``shared_window="verified"`` to
    run_batch (inside jit the starts are tracers and cannot be checked)."""
    starts = np.asarray(scen.start_step)
    if not (starts == starts.flat[0]).all():
        raise ValueError(
            "scenarios have distinct start_steps; use the batched path")


def run_batch(models, layers, cfg: SystemConfig, scen: ScenarioBatch,
              n_steps: int, solver: str | None = None,
              shared_window: bool | str = False) -> closed_loop.StepOutputs:
    """vmap the closed loop over the scenario axis (single device).

    ``shared_window=True`` asserts every scenario uses the SAME
    turbulence window (the make_scenarios default, start_range=None):
    the frozen-flow evolution is then traced UNBATCHED inside the scan
    and broadcast across scenarios -- the batched window gather is the
    single most expensive stage of the step (~9 us/scenario of the
    ~13 us R=128 step, measured), and it is pure waste when the offsets
    are identical.  Trajectories are bit-identical to the batched path.
    When calling from inside jit (starts are tracers and cannot be
    value-checked), run ``assert_shared_window(scen)`` on the concrete
    batch first and pass ``shared_window="verified"``.
    """
    if shared_window:
        s0 = scen.start_step[0]
        try:  # guard: silently replaying one window as N would corrupt
            # the statistics
            assert_shared_window(scen)
        except jax.errors.TracerArrayConversionError:
            # traced start_steps can't be value-checked at trace time --
            # be loud instead of silent so a wrong call site is visible
            if shared_window != "verified":
                import warnings
                warnings.warn(
                    "run_batch(shared_window=True) called with traced "
                    "start_steps: the identical-window invariant cannot "
                    "be verified; every scenario will replay "
                    "start_step[0].  Check the concrete batch with "
                    "assert_shared_window() and pass "
                    "shared_window='verified' to silence this.",
                    stacklevel=2)

        def one_shared(key, mag, noise_scale):
            return closed_loop.simulate(
                models, layers, cfg, key, n_steps=n_steps,
                start_step=s0, solver=solver, mag=mag,
                noise_scale=noise_scale)

        return jax.vmap(one_shared)(scen.key, scen.mag, scen.noise_scale)

    def one(s: ScenarioBatch):
        return closed_loop.simulate(
            models, layers, cfg, s.key, n_steps=n_steps,
            start_step=s.start_step, solver=solver, mag=s.mag,
            noise_scale=s.noise_scale)

    return jax.vmap(one)(scen)


def run_sharded(models, layers, cfg: SystemConfig, scen: ScenarioBatch,
                n_steps: int, mesh, solver: str | None = None,
                shared_window: bool | str = False) -> MonteCarloStats:
    """shard_map over the mesh scenario axis; psum-reduced statistics.

    Scenario count must be a multiple of the mesh size
    (mesh.pad_to_devices).  Models/layers are replicated (broadcast once),
    per-scenario parameters sharded; only O(1) statistics cross chips.
    """
    if shared_window is True:
        # verify on the concrete batch here; inside shard_map the starts
        # are tracers and run_batch could not check them
        try:
            assert_shared_window(scen)
            shared_window = "verified"
        except jax.errors.TracerArrayConversionError:
            pass  # outer-jitted call: run_batch warns below
    n = scen.start_step.shape[0]
    n_dev = mesh.devices.size
    assert n % n_dev == 0, (n, n_dev)
    settle = _settled_slice(n_steps)

    def local(models, layers, scen_shard: ScenarioBatch) -> MonteCarloStats:
        out = run_batch(models, layers, cfg, scen_shard, n_steps, solver,
                        shared_window=shared_window)
        res = out.rms_res[:, settle:]
        turb = out.rms_turb[:, settle:]
        strehl = out.strehl[:, settle:]
        strehl_x = out.strehl_exact[:, settle:]
        cost = out.cost[:, settle:]
        res_m = jnp.mean(res, axis=1)
        turb_m = jnp.mean(turb, axis=1)
        # per-scenario divergence containment (see MonteCarloStats)
        finite = jnp.isfinite(res_m) & jnp.isfinite(turb_m)
        ok = finite & (jnp.nan_to_num(res_m, nan=jnp.inf)
                       <= DIVERGED_REJECTION_FLOOR
                       * jnp.nan_to_num(turb_m, nan=0.0))
        okf = ok.astype(jnp.float32)

        def safe_sum(x_m):
            return jax.lax.psum(
                jnp.sum(jnp.where(ok, jnp.nan_to_num(x_m), 0.0)),
                SCENARIO_AXIS)

        stats = MonteCarloStats(
            mean_rms_res=safe_sum(res_m),
            mean_rms_turb=safe_sum(turb_m),
            mean_strehl=safe_sum(jnp.mean(strehl, axis=1)),
            mean_strehl_exact=safe_sum(jnp.mean(strehl_x, axis=1)),
            # max over INSTANTANEOUS settled residuals of non-diverged
            # scenarios (the worst-case excursion indicator)
            max_rms_res=jax.lax.pmax(
                jnp.max(jnp.where(ok[:, None], jnp.nan_to_num(res), 0.0)),
                SCENARIO_AXIS),
            mean_cost=safe_sum(jnp.mean(cost, axis=1)),
            n_scenarios=jax.lax.psum(jnp.sum(okf), SCENARIO_AXIS),
            n_diverged=jax.lax.psum(jnp.sum(1.0 - okf), SCENARIO_AXIS),
        )
        return stats

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(SCENARIO_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    # place inputs explicitly (setup-time arrays may be committed to a
    # single device by the host-compute path).  Under jax.distributed
    # (process_count > 1) device_put cannot move committed local arrays
    # onto a global sharding; replicated inputs are assembled from the
    # identical per-process copies instead (the deterministic build
    # guarantees they agree), and scenario batches must arrive already
    # global (multihost.global_scenarios).
    from jax.sharding import NamedSharding

    multiproc = jax.process_count() > 1

    def _place(tree, spec):
        sh = NamedSharding(mesh, spec)

        def put(x):
            if (isinstance(x, jax.Array) and hasattr(x, "sharding")
                    and x.sharding.is_equivalent_to(sh, x.ndim)):
                return x
            if multiproc:
                if spec != P():
                    raise ValueError(
                        "multi-process run_sharded needs the scenario "
                        "batch pre-assembled as a global array; build "
                        "it with parallel.multihost.global_scenarios")
                arr = np.asarray(x)
                return jax.make_array_from_process_local_data(
                    sh, arr, arr.shape)
            return jax.device_put(x, sh)

        return jax.tree.map(put, tree)

    models = _place(models, P())
    layers = _place(layers, P())
    scen = _place(scen, P(SCENARIO_AXIS))
    stats = jax.jit(sharded)(models, layers, scen)
    n_f = jnp.maximum(stats.n_scenarios, 1.0)
    return MonteCarloStats(
        mean_rms_res=stats.mean_rms_res / n_f,
        mean_rms_turb=stats.mean_rms_turb / n_f,
        mean_strehl=stats.mean_strehl / n_f,
        mean_strehl_exact=stats.mean_strehl_exact / n_f,
        max_rms_res=stats.max_rms_res,
        mean_cost=stats.mean_cost / n_f,
        n_scenarios=stats.n_scenarios,
        n_diverged=stats.n_diverged,
    )
