"""End-to-end closed-loop tests (small grid, short horizon for CI)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mpc_sensorlessao_tpu.models import pipeline
from mpc_sensorlessao_tpu.utils.config import reference_config


@pytest.fixture(scope="module")
def small_system():
    cfg = reference_config(resolution=64)
    cfg = cfg.replace(sim=dataclasses.replace(
        cfg.sim, n_train=300, n_valid=50, n_test=60))
    system = pipeline.build(cfg, jax.random.PRNGKey(0))
    return cfg, system


def test_open_loop_series_statistics(small_system):
    cfg, system = small_system
    series = np.asarray(system.coeff_series)
    assert series.shape == (350, 28)
    # states nontrivial, piston column present but excluded from VAR
    assert np.std(series[:, 1:]) > 0.05
    # VAR validation quality on the tail (reference README.md:149-155)
    from mpc_sensorlessao_tpu.models import var
    _, rmse, rrmse = var.validate(
        system.var_model, jnp.asarray(series[280:, 1:]))
    assert float(np.mean(np.asarray(rrmse))) < 0.2


def test_closed_loop_converges(small_system):
    cfg, system = small_system
    out = pipeline.run_closed_loop(system, cfg, jax.random.PRNGKey(1))
    rms_turb = np.asarray(out.rms_turb)
    rms_res = np.asarray(out.rms_res)
    # the controller must reject most of the turbulence after settling
    assert rms_res[-30:].mean() < 0.5 * rms_turb[-30:].mean()
    assert np.asarray(out.strehl)[-30:].mean() > 0.8
    assert np.isfinite(np.asarray(out.cost)).all()


def test_solver_backends_agree(small_system):
    cfg, system = small_system
    outs = {s: pipeline.run_closed_loop(system, cfg, jax.random.PRNGKey(1),
                                        n_steps=30, solver=s)
            for s in ("fastmpc", "closed_form", "admm")}
    res = {s: np.asarray(o.rms_res) for s, o in outs.items()}
    # fastmpc (box-only, like Fast_MPC/VAR_2) vs closed-form: nearly equal
    # trajectories at this operating point (far from the box).
    np.testing.assert_allclose(res["fastmpc"], res["closed_form"],
                               rtol=0.15, atol=0.03)
    # admm additionally enforces the ramp bound (like CVX, README.md:516),
    # so early transients differ; steady state must agree.
    assert abs(res["admm"][-10:].mean() - res["fastmpc"][-10:].mean()) < 0.1


def test_determinism(small_system):
    cfg, system = small_system
    o1 = pipeline.run_closed_loop(system, cfg, jax.random.PRNGKey(2),
                                  n_steps=10)
    o2 = pipeline.run_closed_loop(system, cfg, jax.random.PRNGKey(2),
                                  n_steps=10)
    np.testing.assert_array_equal(np.asarray(o1.u), np.asarray(o2.u))


def test_telemetry_shapes(small_system):
    cfg, system = small_system
    out = pipeline.run_closed_loop(system, cfg, jax.random.PRNGKey(1),
                                   n_steps=12)
    assert out.u.shape == (12, 144)
    assert out.volts.shape == (12, 144)
    assert out.x_est.shape == (12, 27)
    assert out.cost.shape == (12,)
    # voltage anchor: |u|<=28 rad -> |V|<=~200 (README.md:353)
    assert np.abs(np.asarray(out.volts)).max() < 210


def test_ramp_constraint_respected_by_admm(small_system):
    cfg, system = small_system
    out = pipeline.run_closed_loop(system, cfg, jax.random.PRNGKey(3),
                                   n_steps=25, solver="admm")
    du = np.asarray(out.du)
    # ramp bound du_max=0.2121 (README.md:355); ADMM enforces it
    assert np.abs(du[1:]).max() <= cfg.mpc.du_max * 1.05


def test_exact_strehl_telemetry(small_system):
    """strehl_exact = OTF-volume Strehl from the zd=0 diversity crop
    (imager.m:98-115).  At the settled small residual it must agree
    with the Marechal approximation to a few percent; both in (0, 1]."""
    cfg, system = small_system
    out = pipeline.run_closed_loop(system, cfg, jax.random.PRNGKey(1))
    sx = np.asarray(out.strehl_exact)
    sm = np.asarray(out.strehl)
    assert sx.shape == sm.shape
    assert np.all(sx > 0.0) and np.all(sx < 1.0 + 1e-5)
    settled = slice(-30, None)
    assert np.abs(sx[settled] - sm[settled]).max() < 0.05
    # cross-check step 0 against an oracle OTF-ratio Strehl computed
    # from the full-frame PSF of the same residual phase
    from mpc_sensorlessao_tpu.models import estimator as est_mod
    from mpc_sensorlessao_tpu.ops import phase_screens, psf, zernike
    start = cfg.sim.n_train + cfg.sim.n_valid
    raw = phase_screens.phase_at(system.layers, start, cfg.resolution)
    phase = zernike.piston_removed_phase(system.basis, raw) * float(
        cfg.sim.magnification)
    # step 0 residual = turbulence (cold start, zero DM)
    im = psf.psf_intensity(phase, system.loop.est.pupil, 1.0)
    im0 = psf.psf_intensity(jnp.zeros_like(phase),
                            system.loop.est.pupil, 1.0)
    oracle = float(jnp.max(im) / jnp.max(im0))
    assert sx[0] == pytest.approx(oracle, rel=0.02)
