"""Integrator controller + calibration vault (controller.m, calibrationVault.m)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpc_sensorlessao_tpu.models import integrator, wfs
from mpc_sensorlessao_tpu.ops import zernike


@pytest.fixture(scope="module")
def sh_setup():
    R = 48
    model = wfs.build(R, n_lenslet=8)
    basis = zernike.make_basis(radial_order=4, resolution=R)
    modes = basis.stack[1:]                                    # drop piston
    flat = modes.reshape(modes.shape[0], -1)
    D = wfs.interaction_matrix(model, modes)
    return model, flat, D


def test_vault_reconstructs_pinv(sh_setup):
    _, _, D = sh_setup
    vault = integrator.calibration_vault(D)
    Dn = np.asarray(D, dtype=np.float64)
    np.testing.assert_allclose(np.asarray(vault.M), np.linalg.pinv(Dn),
                               atol=1e-4)
    assert vault.n_thresholded == 0


def test_vault_truncation_controls_agree(sh_setup):
    """count / threshold / cond truncation are three views of one knob
    (calibrationVault.m:97-125)."""
    _, _, D = sh_setup
    by_count = integrator.calibration_vault(D, n_thresholded=3)
    s = by_count.singular
    by_thresh = integrator.calibration_vault(D, threshold=(s[-3] + s[-4]) / 2)
    assert by_thresh.n_thresholded == 3
    cond_val = float(s[0] / s[-3]) - 1e-9
    by_cond = integrator.calibration_vault(D, cond=cond_val)
    assert by_cond.n_thresholded == 3
    np.testing.assert_allclose(np.asarray(by_count.M),
                               np.asarray(by_thresh.M), atol=1e-6)
    # truncated modes actually gone: rank of M drops
    rank = np.linalg.matrix_rank(np.asarray(by_count.M), tol=1e-5)
    full_rank = np.linalg.matrix_rank(
        np.asarray(integrator.calibration_vault(D).M), tol=1e-5)
    assert rank == full_rank - 3
    assert by_count.cond <= integrator.calibration_vault(D).cond


def test_integrator_converges_on_static_aberration(sh_setup):
    model, flat, D = sh_setup
    vault = integrator.calibration_vault(D)
    rng = np.random.default_rng(0)
    a = rng.normal(size=flat.shape[0]).astype(np.float32) * 0.3
    phi = jnp.asarray(a) @ flat                      # static modal phase
    turb = jnp.tile(phi[None], (40, 1))
    c_acc, rms = integrator.closed_loop(
        model.slope_op, vault, flat, turb,
        integrator.IntegratorConfig(gain=0.5, delay=0))
    # geometric SH on low orders is near-exact: residual must collapse
    assert float(rms[-1]) < 0.02 * float(rms[0])
    np.testing.assert_allclose(np.asarray(c_acc[-1]), a, atol=0.05)


def test_integrator_delay_slows_but_converges(sh_setup):
    model, flat, D = sh_setup
    vault = integrator.calibration_vault(D)
    rng = np.random.default_rng(1)
    a = rng.normal(size=flat.shape[0]).astype(np.float32) * 0.3
    turb = jnp.tile((jnp.asarray(a) @ flat)[None], (60, 1))
    cfg0 = integrator.IntegratorConfig(gain=0.4, delay=0)
    cfg2 = integrator.IntegratorConfig(gain=0.4, delay=2)
    _, rms0 = integrator.closed_loop(model.slope_op, vault, flat, turb, cfg0)
    _, rms2 = integrator.closed_loop(model.slope_op, vault, flat, turb, cfg2)
    assert float(rms2[5]) > float(rms0[5])           # delay hurts early
    assert float(rms2[-1]) < 0.05 * float(rms2[0])   # still converges


def test_leak_bounds_command(sh_setup):
    model, flat, D = sh_setup
    vault = integrator.calibration_vault(D)
    a = np.zeros(flat.shape[0], dtype=np.float32)
    a[0] = 1.0
    turb = jnp.tile((jnp.asarray(a) @ flat)[None], (80, 1))
    cfg = integrator.IntegratorConfig(gain=0.3, leak=0.05, delay=0)
    c_acc, _ = integrator.closed_loop(model.slope_op, vault, flat, turb, cfg)
    # leaky integrator steady state < full correction
    assert 0.5 < float(c_acc[-1, 0]) < 1.0


def test_zero_delay_has_one_frame_actuation_latency(sh_setup):
    """The command computed from frame t acts on frame t+1: the first
    reported residual equals the uncorrected turbulence even at
    delay=0 (reference controller timing)."""
    model, flat, D = sh_setup
    vault = integrator.calibration_vault(D)
    rng = np.random.default_rng(2)
    a = rng.normal(size=flat.shape[0]).astype(np.float32) * 0.3
    phi = jnp.asarray(a) @ flat
    turb = jnp.tile(phi[None], (10, 1))
    _, rms = integrator.closed_loop(
        model.slope_op, vault, flat, turb,
        integrator.IntegratorConfig(gain=0.5, delay=0))
    assert float(rms[0]) == pytest.approx(
        float(jnp.sqrt(jnp.mean(phi * phi))), rel=1e-5)
    assert float(rms[1]) < float(rms[0])     # correction from frame 1


def test_slope_noise_degrades_and_is_seedable():
    """The slope-noise path (shackHartmann camera noise at the slopes
    level) degrades the integrator's settled residual monotonically."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    P, K, T, n_s = 100, 6, 120, 24
    S = jnp.asarray(rng.normal(size=(n_s, P)) * 0.3, jnp.float32)
    modes = jnp.asarray(rng.normal(size=(K, P)), jnp.float32)
    D = S @ modes.T
    vault = integrator.calibration_vault(D)
    # slowly varying turbulence in the mode span
    t = np.linspace(0, 4 * np.pi, T)
    coefs = np.stack([np.sin(t + k) for k in range(K)], axis=1)
    turb = jnp.asarray(coefs @ np.asarray(modes), jnp.float32)
    errs = []
    for sigma in (0.0, 0.05, 0.2):
        noise = None
        if sigma > 0:
            noise = sigma * jax.random.normal(jax.random.PRNGKey(0),
                                              (T, n_s))
        _, rms = integrator.closed_loop(S, vault, modes, turb,
                                        integrator.IntegratorConfig(0.5),
                                        slope_noise=noise)
        errs.append(float(np.asarray(rms)[T // 2:].mean()))
    assert errs[0] < errs[1] < errs[2]
