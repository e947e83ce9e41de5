"""BASELINE.json config-matrix coverage at reduced scale:

1. VAR(1), 28 modes, single realization (fastmpc_ramp = Fast_MPC/VAR_1)
2. VAR(2), box constraints (default)             [test_closed_loop.py]
3. Mode sweep 28 -> 66 modes with longer horizon
4. Batched Monte-Carlo over D/r0 x SNR           [test_parallel.py]
"""

import dataclasses

import numpy as np
import pytest
import jax

from mpc_sensorlessao_tpu.models import pipeline
from mpc_sensorlessao_tpu.utils.config import reference_config


def _cfg(resolution=64, **mpc_kw):
    cfg = reference_config(resolution=resolution)
    sim = dataclasses.replace(cfg.sim, n_train=300, n_valid=50, n_test=40)
    mpc = dataclasses.replace(cfg.mpc, **mpc_kw)
    return cfg.replace(sim=sim, mpc=mpc)


def test_var1_pipeline_with_ramp_solver():
    """Config 1: VAR(1) model + active ramp rows (Fast_MPC/VAR_1)."""
    cfg = _cfg(var_order=1, solver="fastmpc_ramp")
    system = pipeline.build(cfg, jax.random.PRNGKey(0))
    # VAR(1): A2 must be zero in the problem
    assert float(np.abs(np.asarray(system.loop.prob.A2)).max()) == 0.0
    out = pipeline.run_closed_loop(system, cfg, jax.random.PRNGKey(1))
    rms_res = np.asarray(out.rms_res)
    rms_turb = np.asarray(out.rms_turb)
    du = np.asarray(out.du)
    # ramp bound respected by construction
    assert np.abs(du).max() <= cfg.mpc.du_max * 1.01
    # slower convergence than unconstrained, but converging
    assert rms_res[-10:].mean() < 0.75 * rms_turb[-10:].mean()


def test_mode_sweep_66_modes():
    """Config 3: radial order 10 -> 66 modes, with the high-order recipe
    (ridge-regularized VAR + MMSE estimator).

    Plain reference-style LS identification is unstable here (130
    regressors per row on the training window -> companion spectral
    radius > 1), and the unweighted LS estimator has ~100% error on
    orders 7-10; together they turn the loop into a noise amplifier.
    var_ridge + estimator method="mmse" fix both, and the 66-mode loop
    then *beats* the 28-mode one (orders 7-10 corrected too)."""
    cfg = _cfg(horizon=2, var_ridge=1e-2)
    cfg = cfg.replace(
        zernike=dataclasses.replace(cfg.zernike, radial_order=10),
        estimator=dataclasses.replace(cfg.estimator, method="mmse"))
    assert cfg.zernike.n_modes == 66
    system = pipeline.build(cfg, jax.random.PRNGKey(0))
    assert system.loop.prob.A1.shape == (65, 65)
    assert system.mats.M1.shape == (2 * 65, 65)
    out = pipeline.run_closed_loop(system, cfg, jax.random.PRNGKey(1))
    rms_res = np.asarray(out.rms_res)
    rms_turb = np.asarray(out.rms_turb)
    assert np.isfinite(rms_res).all()
    # meaningful optical quality, not just bounded outputs
    assert rms_res[-15:].mean() < 0.35 * rms_turb[-15:].mean()
    assert np.asarray(out.strehl)[-15:].mean() > 0.9
    # sane control effort (far from the box; the broken loop slams 28)
    assert np.abs(np.asarray(out.u)).max() < 10.0


def test_66_modes_unregularized_is_noise_amplifier():
    """Regression guard for the diagnosis: the reference-parity plain-LS
    identification at 66 modes yields an unstable companion matrix."""
    from mpc_sensorlessao_tpu.models import var
    cfg = _cfg(horizon=2)
    cfg = cfg.replace(zernike=dataclasses.replace(cfg.zernike,
                                                  radial_order=10))
    system = pipeline.build(cfg, jax.random.PRNGKey(0))
    rho = var.companion_spectral_radius(system.var_model)
    assert rho > 1.0, rho
    stabilized = var.stabilize(system.var_model, 0.98)
    assert var.companion_spectral_radius(stabilized) <= 0.9801


def test_horizon_8_long():
    """Longer horizons exercise the banded Schur assembly."""
    cfg = _cfg(horizon=8)
    system = pipeline.build(cfg, jax.random.PRNGKey(0))
    out = pipeline.run_closed_loop(system, cfg, jax.random.PRNGKey(1),
                                   n_steps=15)
    assert np.isfinite(np.asarray(out.rms_res)).all()
    assert np.asarray(out.rms_res)[-5:].mean() < 0.5


def test_d_over_r0_10_closes_with_recipe():
    """Beyond the reference's demonstrated envelope: D/r0=10 (|x|~2.6 rad,
    past the linear estimator's cold-start capture range) closes and
    settles via the high-order recipe + calibration-handover warm start.
    The wall at D/r0 >= 10 is 28-mode aliasing (unmodeled orders bias the
    estimate every step), not capture: modeling through order 10 removes
    it, and the warm start makes the first-step residual the VAR
    prediction error instead of the full turbulence."""
    import dataclasses
    # R=64: order-10 modes need this sampling; at 48 px the high-order
    # estimator columns alias and the loop cannot hold the lock
    cfg = reference_config(resolution=64)
    cfg = cfg.replace(
        zernike=dataclasses.replace(cfg.zernike, radial_order=10),
        mpc=dataclasses.replace(cfg.mpc, warm_start=True, var_ridge=1e-2),
        estimator=dataclasses.replace(cfg.estimator, method="mmse"),
        sim=dataclasses.replace(cfg.sim, n_train=300, n_valid=50, n_test=50,
                                d_over_r0=10.0))
    system = pipeline.build(cfg, jax.random.PRNGKey(0))
    out = pipeline.run_closed_loop(system, cfg, jax.random.PRNGKey(1))
    res = np.asarray(out.rms_res)
    turb = np.asarray(out.rms_turb)
    # warm start: first residual at prediction-error level (the cold
    # start at this operating point begins at ~1.2 rad)
    assert res[0] < 0.8
    assert res[-15:].mean() < 0.35 * turb[-15:].mean()
    assert np.asarray(out.strehl)[-15:].mean() > 0.8


def test_warm_start_command_bounded_and_cancels():
    cfg = _cfg()
    cfg = cfg.replace(mpc=dataclasses.replace(cfg.mpc, warm_start=True))
    system = pipeline.build(cfg, jax.random.PRNGKey(0))
    start = cfg.sim.n_train + cfg.sim.n_valid
    u0 = np.asarray(pipeline.warm_start_command(system, cfg, start))
    assert np.abs(u0).max() <= 0.5 * cfg.mpc.u_max + 1e-6
    states = np.asarray(system.coeff_series[:, 1:])
    A1 = np.asarray(system.var_model.coefficient(1))
    A2 = np.asarray(system.var_model.coefficient(2))
    x_pred = A1 @ states[start - 1] + A2 @ states[start - 2]
    B = np.asarray(system.dm_model.influence)
    resid = x_pred + B @ u0
    assert np.linalg.norm(resid) < 0.2 * np.linalg.norm(x_pred)


def test_d_over_r0_15_closes_with_shrunk_prior():
    """D/r0=15 -- past what round 1 called the physical limit (Strehl
    ~0.37).  Root cause of the old wall: the MMSE prior at open-loop scale
    (prior_scale=1) barely shrinks, chronic high-order estimation error
    feeds the MPC and the loop injects aberration.  Residual-scale
    shrinkage (prior_scale ~ 0.5/(D/r0), a low-gain-integrator trade of
    bandwidth for noise rejection) holds the 500-step lock at D/r0 up to
    20 (measured at R=128: Strehl 0.95/0.91/0.87 at 10/15/20)."""
    cfg = reference_config(resolution=128)
    cfg = cfg.replace(
        zernike=dataclasses.replace(cfg.zernike, radial_order=10),
        mpc=dataclasses.replace(cfg.mpc, warm_start=True, var_ridge=1e-2,
                                r_weight=30.0),
        estimator=dataclasses.replace(cfg.estimator, method="mmse",
                                      prior_scale=0.05),
        sim=dataclasses.replace(cfg.sim, n_train=300, n_valid=50,
                                n_test=60, d_over_r0=15.0))
    system = pipeline.build(cfg, jax.random.PRNGKey(0))
    out = pipeline.run_closed_loop(system, cfg, jax.random.PRNGKey(1))
    res = np.asarray(out.rms_res)
    turb = np.asarray(out.rms_turb)
    assert res.max() < 1.0
    assert res[30:].mean() < 0.35 * turb[30:].mean()
    assert np.asarray(out.strehl_exact)[30:].mean() > 0.85


def test_estimator_fusion_defaults_are_noop():
    """est_gain=1 + innovation_gate=None (defaults) must reproduce the
    reference path bit-for-bit; an armed but never-triggered gate must
    stay finite."""
    from mpc_sensorlessao_tpu.models import closed_loop
    cfg = _cfg()
    system = pipeline.build(cfg, jax.random.PRNGKey(0))
    out_ref = pipeline.run_closed_loop(system, cfg, jax.random.PRNGKey(1))
    cfg_g = _cfg(est_gain=0.9, innovation_gate=5.0)
    out_g = closed_loop.simulate(
        system.loop, system.layers, cfg_g, jax.random.PRNGKey(1),
        n_steps=cfg_g.sim.n_test,
        start_step=cfg_g.sim.n_train + cfg_g.sim.n_valid)
    assert np.isfinite(np.asarray(out_g.rms_res)).all()
    # gated loop tracks the reference loop while estimates are plausible
    assert np.abs(np.asarray(out_g.rms_res)
                  - np.asarray(out_ref.rms_res)).max() < 0.5
