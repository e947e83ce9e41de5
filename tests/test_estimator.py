"""Estimator: PSF model regeneration parity + estimation accuracy."""

import h5py
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mpc_sensorlessao_tpu.models import estimator
from mpc_sensorlessao_tpu.ops import psf, zernike
from mpc_sensorlessao_tpu.utils.config import EstimatorConfig

REF_MAT = "/root/reference/model_approx.mat"


@pytest.fixture(scope="module")
def model128():
    basis = zernike.make_basis(6, 128)
    cfg = EstimatorConfig(resolution=128)
    return basis, estimator.build(cfg, basis)


def test_pupil_mask_matches_reference_convention():
    # README.md:383-391: disc radius R/2-1 centered at index R/2
    m = np.asarray(psf.pupil_mask_np(64))
    assert m[32, 32]
    assert m[32, 63] and m[32, 1]          # radius 31 reaches both edges
    assert not m[32, 0] and not m[0, 0]    # beyond radius 31


def test_measurement_vector_column_major():
    crop = jnp.arange(2 * 3 * 3, dtype=jnp.float32).reshape(1, 2, 3, 3)
    y = np.asarray(psf.measurement_vector(crop))[0]
    first = np.arange(9).reshape(3, 3)
    np.testing.assert_array_equal(y[:9], first.T.ravel())  # column-major


@pytest.mark.slow
def test_model_regeneration_matches_shipped_mat():
    """Regenerated A_s/b_s vs model_approx.mat (SURVEY.md 2c) at R=512."""
    basis = zernike.make_basis(6, 512)
    cfg = EstimatorConfig(resolution=512)
    model = estimator.build(cfg, basis, include_piston=True)
    with h5py.File(REF_MAT, "r") as f:
        A_ref = np.array(f["A_s"]).T
        b_ref = np.array(f["b_s"]).ravel()
    A = np.asarray(model.A_s, dtype=np.float64)
    b = np.asarray(model.b_s, dtype=np.float64)
    assert np.linalg.norm(b - b_ref) / np.linalg.norm(b_ref) < 1e-6
    # piston column is ~0 by phase invariance; compare the rest
    for k in range(1, 28):
        rel = np.linalg.norm(A[:, k] - A_ref[:, k]) / np.linalg.norm(A_ref[:, k])
        assert rel < 1e-5, (k, rel)


def test_estimator_recovers_small_aberrations(model128):
    basis, model = model128
    rng = np.random.default_rng(3)
    alpha = jnp.asarray(rng.normal(size=27) * 0.05, dtype=jnp.float32)
    phase = zernike.synthesize(basis, jnp.concatenate([jnp.zeros(1), alpha]))
    y = estimator.measure(model, phase)
    est = estimator.estimate(model, y)
    err = np.linalg.norm(np.asarray(est) - np.asarray(alpha))
    assert err / np.linalg.norm(np.asarray(alpha)) < 0.05, err


def test_estimator_batched(model128):
    basis, model = model128
    rng = np.random.default_rng(4)
    alphas = jnp.asarray(rng.normal(size=(5, 27)) * 0.03, dtype=jnp.float32)
    coeffs = jnp.concatenate([jnp.zeros((5, 1)), alphas], axis=1)
    phases = zernike.synthesize(basis, coeffs)
    y = estimator.measure(model, phases)
    assert y.shape == (5, model.n_pixels)
    est = estimator.estimate(model, y)
    assert est.shape == (5, 27)
    np.testing.assert_allclose(np.asarray(est), np.asarray(alphas), atol=0.02)


def test_noise_snr_definitions(model128):
    basis, model = model128
    # default "mean_abs": sigma = mean(|b_s|) 10^(-SNR/20)
    key = jax.random.PRNGKey(0)
    noise = estimator.sample_noise(model, key, shape=(256,))
    emp_std = float(jnp.std(noise))
    expect = float(jnp.mean(jnp.abs(model.b_s))) * 10 ** (-10 / 20)
    assert abs(emp_std / expect - 1.0) < 0.05

    # "vector_power" variant: sigma^2 = mean(b_s^2) 10^(-SNR/10)
    cfg_vp = EstimatorConfig(resolution=128, snr_reference="vector_power")
    model_vp = estimator.build(cfg_vp, basis)
    sig = float(jnp.mean(model_vp.b_s ** 2))
    assert abs(float(model_vp.noise_std) ** 2 / (sig / 10.0) - 1.0) < 1e-3


def test_mmse_estimator_shrinks_weakly_sensed_modes(model128):
    """method="mmse": the Bayesian gain reduces noise amplification on
    weakly-sensed modes while matching LS on well-sensed ones."""
    basis, ls = model128
    # analytic prior
    from mpc_sensorlessao_tpu.ops import zernike_stats
    from mpc_sensorlessao_tpu.utils.config import AtmosphereConfig
    atm = AtmosphereConfig()
    C = zernike_stats.coefficient_covariance(atm, 1.0, 6, resolution=48)
    mcfg = EstimatorConfig(resolution=128, method="mmse")
    mmse = estimator.build(mcfg, basis, prior_cov=C[1:, 1:])

    # noise-gain rows: ||row||^2 * sigma^2 = per-mode output noise var
    g_ls = np.linalg.norm(np.asarray(ls.solve_op), axis=1)
    g_mm = np.linalg.norm(np.asarray(mmse.solve_op), axis=1)
    assert (g_mm <= g_ls * 1.001).all()
    # and a real small-aberration estimate stays accurate
    key = jax.random.PRNGKey(0)
    x_true = 0.1 * jax.random.normal(key, (27,))
    phase = jnp.einsum("k,kij->ij", x_true, basis.stack[1:])
    y = estimator.measure(mmse, phase)
    x_hat = estimator.estimate(mmse, y)
    assert float(jnp.linalg.norm(x_hat - x_true)) < 0.25 * float(
        jnp.linalg.norm(x_true))


def test_mmse_requires_prior():
    basis = zernike.make_basis(2, 32)
    cfg = EstimatorConfig(resolution=32, method="mmse")
    with pytest.raises(ValueError):
        estimator.build(cfg, basis)
    with pytest.raises(ValueError):
        estimator.build(EstimatorConfig(resolution=32, method="wat"), basis)


def test_full_gauss_newton_extends_capture(model128):
    """Re-linearized GN recovers aberrations far beyond the zero-point
    linearization's ~1 rad validity (the D/r0>=10 acquisition tool)."""
    basis, model = model128
    stack = basis.stack[1:]
    key = jax.random.PRNGKey(3)
    x_true = jax.random.normal(key, (27,))
    x_true = x_true / jnp.linalg.norm(x_true) * 1.4      # 1.4 rad
    phase = jnp.einsum("k,kij->ij", x_true, stack)
    y = estimator.measure(model, phase)
    e_lin = float(jnp.linalg.norm(
        estimator.estimate(model, y) - x_true))
    e_full = float(jnp.linalg.norm(
        estimator.estimate_full_gn(model, y, stack, 4) - x_true))
    nt = float(jnp.linalg.norm(x_true))
    assert e_lin / nt > 0.25          # linear estimator is off the rails
    assert e_full / nt < 0.1          # full GN locks
    assert e_full < 0.35 * e_lin


def test_full_gn_tracks_large_aberration_from_seed():
    """estimate_full_gn seeded within ~0.3 rad tracks a multi-radian
    aberration (capture depends on |x - x_init|, not |x|) -- the
    acquisition/tracking property behind EstimatorConfig.track_gn_iters."""
    import dataclasses
    from mpc_sensorlessao_tpu.models import pipeline as pipeline_mod
    from mpc_sensorlessao_tpu.utils.config import reference_config
    cfg = reference_config(resolution=64)
    cfg = cfg.replace(sim=dataclasses.replace(
        cfg.sim, n_train=300, n_valid=50, d_over_r0=10.0))
    system = pipeline_mod.build(cfg, jax.random.PRNGKey(0))
    est = system.loop.est
    stack = system.loop.state_stack
    x_true = jnp.asarray(np.asarray(system.coeff_series)[290, 1:])
    assert float(jnp.linalg.norm(x_true)) > 2.0   # far past linear capture
    phase = jnp.einsum("k,kij->ij", x_true, stack)
    y = estimator.measure(est, phase, None) + estimator.sample_noise(
        est, jax.random.PRNGKey(5))
    rng = np.random.default_rng(0)
    dx = rng.normal(size=x_true.shape)
    dx = dx / np.linalg.norm(dx) * 0.3
    seed = x_true + jnp.asarray(dx, dtype=jnp.float32)
    x_gn = estimator.estimate_full_gn(est, y, stack, 2, x_init=seed)
    err = float(jnp.linalg.norm(x_gn - x_true))
    assert err < 0.25, err
    # the linear estimator is lost at this amplitude
    err_lin = float(jnp.linalg.norm(estimator.estimate(est, y) - x_true))
    assert err_lin > 3 * err
