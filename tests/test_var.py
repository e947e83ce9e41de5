"""VAR identification: recovery of known dynamics, validation metrics."""

import numpy as np
import jax.numpy as jnp

from mpc_sensorlessao_tpu.models import var


def _simulate_var2(A1, A2, T, noise, rng):
    nx = A1.shape[0]
    xs = [rng.normal(size=nx), rng.normal(size=nx)]
    for _ in range(T - 2):
        xs.append(A1 @ xs[-1] + A2 @ xs[-2] + noise * rng.normal(size=nx))
    return np.stack(xs)


def test_var2_recovers_true_matrices():
    rng = np.random.default_rng(0)
    nx = 4
    A1 = 0.5 * np.eye(nx) + 0.05 * rng.normal(size=(nx, nx))
    A2 = 0.2 * np.eye(nx) + 0.05 * rng.normal(size=(nx, nx))
    series = _simulate_var2(A1, A2, 4000, 0.05, rng)
    model = var.fit(jnp.asarray(series, dtype=jnp.float32), order=2)
    np.testing.assert_allclose(np.asarray(model.A[0]), A1, atol=6e-2)
    np.testing.assert_allclose(np.asarray(model.A[1]), A2, atol=6e-2)


def test_var1_fit_and_predict():
    rng = np.random.default_rng(1)
    nx = 3
    A = np.array([[0.9, 0.1, 0.0], [0.0, 0.8, 0.1], [0.05, 0.0, 0.7]])
    xs = [rng.normal(size=nx)]
    for _ in range(3000):
        xs.append(A @ xs[-1] + 0.02 * rng.normal(size=nx))
    series = jnp.asarray(np.stack(xs), dtype=jnp.float32)
    model = var.fit(series, order=1)
    np.testing.assert_allclose(np.asarray(model.A[0]), A, atol=5e-2)
    pred = var.predict_one_step(model, series[-2:-1])
    np.testing.assert_allclose(np.asarray(pred),
                               np.asarray(series[-2]) @ A.T, atol=5e-2)


def test_validation_metrics():
    rng = np.random.default_rng(2)
    nx = 3
    A1 = 0.6 * np.eye(nx)
    A2 = 0.3 * np.eye(nx)
    series = _simulate_var2(A1, A2, 3000, 0.01, rng)
    model = var.fit(jnp.asarray(series[:2000], dtype=jnp.float32), order=2)
    pred, rmse, rrmse = var.validate(
        model, jnp.asarray(series[2000:], dtype=jnp.float32))
    assert pred.shape[0] == 1000 - 2
    assert np.all(np.asarray(rmse) < 0.05)
    assert np.all(np.asarray(rrmse) < 0.2)


def test_lag_matrix_layout():
    # README.md:120-125: AA row i has [x[i-1] | x[i-2]] blocks, target x[i]
    series = jnp.arange(10, dtype=jnp.float32).reshape(5, 2)
    AA, BB = var.lag_matrix(series, 2)
    np.testing.assert_array_equal(np.asarray(AA[0]), [2, 3, 0, 1])
    np.testing.assert_array_equal(np.asarray(BB[0]), [4, 5])


def test_ridge_shrinks_and_zero_matches_ls():
    rng = np.random.default_rng(1)
    # short window, many modes: plain LS overfits
    nx, T = 12, 40
    series = jnp.asarray(np.cumsum(rng.normal(size=(T, nx)), axis=0),
                         jnp.float32)
    m0 = var.fit(series, 2)
    m0b = var.fit(series, 2, ridge=0.0)
    np.testing.assert_array_equal(np.asarray(m0.A), np.asarray(m0b.A))
    mr = var.fit(series, 2, ridge=1e-1)
    assert (np.linalg.norm(np.asarray(mr.A))
            < np.linalg.norm(np.asarray(m0.A)))


def test_stabilize_caps_spectral_radius():
    rng = np.random.default_rng(2)
    A1 = jnp.asarray(1.4 * np.eye(4) + 0.1 * rng.normal(size=(4, 4)),
                     jnp.float32)
    A2 = jnp.asarray(-0.5 * np.eye(4), jnp.float32)
    m = var.VARModel(A=jnp.stack([A1, A2]), order=2)
    rho = var.companion_spectral_radius(m)
    assert rho > 1.0
    ms = var.stabilize(m, 0.95)
    rho_s = var.companion_spectral_radius(ms)
    assert rho_s <= 0.95 + 1e-5
    # gamma^j scaling: exact eigenvalue shrink, A1 direction preserved
    np.testing.assert_allclose(
        np.asarray(ms.A[0]) / np.asarray(m.A[0]), 0.95 / rho, rtol=1e-5)
    # already-stable models untouched
    assert var.stabilize(ms, 0.99) is ms
