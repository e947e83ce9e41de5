"""Golden-trajectory parity: JAX engine vs independent NumPy oracle.

The BASELINE north star requires the control trajectory to match a
reference implementation within tolerance; MATLAB being unavailable, the
oracle is tests/oracle_numpy.py -- a deliberately naive float64
re-transcription of the reference loop sharing no code with the engine.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mpc_sensorlessao_tpu.models import closed_loop, estimator, pipeline
from mpc_sensorlessao_tpu.utils.config import reference_config

from oracle_numpy import closed_loop as oracle_loop


@pytest.fixture(scope="module")
def setup():
    cfg = reference_config(resolution=64)
    cfg = cfg.replace(sim=dataclasses.replace(
        cfg.sim, n_train=300, n_valid=50, n_test=20))
    system = pipeline.build(cfg, jax.random.PRNGKey(0))
    return cfg, system


def _oracle_params(cfg, system, solver):
    est = system.loop.est
    q = cfg.mpc.q_weight
    nx = 27
    n_act = 144
    R_ = np.asarray(system.basis.mask).shape[0]
    padded = np.asarray(system.layers.screens, dtype=np.float64)
    return {
        # strip the engine's wrap-padding: the oracle wraps by itself
        "screens": padded[:, : -(R_ + 1), : -(R_ + 1)],
        "step_px": np.asarray(system.layers.step_px, dtype=np.float64),
        "start": float(cfg.sim.n_train + cfg.sim.n_valid),
        "mag": cfg.sim.magnification,
        "mask": np.asarray(system.basis.mask),
        "pupil": np.asarray(est.pupil, dtype=np.float64),
        "div_phases": np.asarray(est.diversity_phases, dtype=np.float64),
        "crop_half": est.crop_half,
        "scale": est.scale,
        "A_s": np.asarray(est.A_s, dtype=np.float64),
        "b_s": np.asarray(est.b_s, dtype=np.float64),
        "solve_op": np.asarray(est.solve_op, dtype=np.float64),
        "influence": np.asarray(system.dm_model.influence, dtype=np.float64),
        "state_stack": np.asarray(system.basis.stack[1:], dtype=np.float64),
        "M1": np.asarray(system.mats.M1, dtype=np.float64),
        "M2": np.asarray(system.mats.M2, dtype=np.float64),
        "B_conv": np.asarray(system.mats.B_conv, dtype=np.float64),
        "Q_tilda": np.asarray(system.mats.Q_tilda, dtype=np.float64),
        "closed_form": np.asarray(system.mats.closed_form, dtype=np.float64),
        "A1": np.asarray(system.var_model.A[0], dtype=np.float64),
        "A2": np.asarray(system.var_model.A[1], dtype=np.float64),
        "Q": q * np.eye(nx),
        "R": np.eye(n_act),
        "Qf": q * np.eye(nx),
        "u_max": cfg.mpc.u_max,
        "barrier_k": cfg.mpc.barrier_k,
        "newton_steps": cfg.mpc.newton_steps,
        "horizon": cfg.mpc.horizon,
    }


def _run_engine(cfg, system, noise, solver):
    """Run the JAX loop with the SAME injected noise sequence the oracle
    sees (closed_loop.simulate noise_seq): noise is added to the measured
    PSF stack exactly where the reference adds its precomputed SNR_10.mat
    noise (README.md:473-475).  An all-zero sequence gives the noise-free
    comparison."""
    out = closed_loop.simulate(
        system.loop, system.layers, cfg, jax.random.PRNGKey(9),
        n_steps=noise.shape[0],
        start_step=float(cfg.sim.n_train + cfg.sim.n_valid),
        solver=solver, noise_scale=1.0,
        noise_seq=jnp.asarray(noise, dtype=jnp.float32))
    return np.asarray(out.u), np.asarray(out.rms_res)


@pytest.mark.parametrize("solver", ["closed_form", "fastmpc"])
@pytest.mark.parametrize("noisy", [False, True])
def test_trajectory_matches_numpy_oracle(setup, solver, noisy):
    cfg, system = setup
    n_steps = 10
    if noisy:
        # shared measurement-noise sequence at the configured SNR (10 dB):
        # the noisy estimator path (noise scaling + injection point) is
        # oracle-checked end-to-end, not just the std definition
        rng = np.random.default_rng(7)
        std = float(system.loop.est.noise_std)
        noise = (std * rng.standard_normal(
            (n_steps, system.loop.est.n_pixels))).astype(np.float64)
    else:
        noise = np.zeros((n_steps, system.loop.est.n_pixels))
    params = _oracle_params(cfg, system, solver)
    gn = cfg.estimator.gauss_newton_iters
    u_ref, rms_ref = oracle_loop(params, n_steps, noise, solver=solver,
                                 cold_start=cfg.mpc.cold_start,
                                 gauss_newton_iters=gn)
    u_jax, rms_jax = _run_engine(cfg, system, noise, solver)

    # residual-RMS trajectory within 1% of oracle (BASELINE.md target)
    np.testing.assert_allclose(rms_jax, rms_ref, rtol=0.01, atol=5e-3)
    # control inputs match within f32-vs-f64 accumulated tolerance
    scale = np.abs(u_ref).max()
    np.testing.assert_allclose(u_jax, u_ref, atol=0.02 * scale)


@pytest.mark.slow
def test_reference_scale_trajectory_parity():
    """Flagship-scale parity (BASELINE.md north star): the full 512-px
    estimator grid (README.md:237), 50 closed-loop steps, residual-RMS
    trajectory within 1% of the independent float64 NumPy oracle
    (measured: ~2e-5 relative)."""
    cfg = reference_config(resolution=512)
    cfg = cfg.replace(sim=dataclasses.replace(
        cfg.sim, n_train=300, n_valid=50, n_test=50))
    system = pipeline.build(cfg, jax.random.PRNGKey(0))
    n_steps = 50
    noise = np.zeros((n_steps, system.loop.est.n_pixels))
    params = _oracle_params(cfg, system, "fastmpc")
    u_ref, rms_ref = oracle_loop(
        params, n_steps, noise, solver="fastmpc",
        cold_start=cfg.mpc.cold_start,
        gauss_newton_iters=cfg.estimator.gauss_newton_iters)
    out = closed_loop.simulate(
        system.loop, system.layers, cfg, jax.random.PRNGKey(9),
        n_steps=n_steps, start_step=float(cfg.sim.n_train + cfg.sim.n_valid),
        solver="fastmpc", noise_scale=0.0)
    np.testing.assert_allclose(np.asarray(out.rms_res), rms_ref,
                               rtol=0.01, atol=1e-4)
    scale = np.abs(u_ref).max()
    np.testing.assert_allclose(np.asarray(out.u), u_ref, atol=0.01 * scale)
