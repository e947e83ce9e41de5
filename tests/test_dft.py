"""Partial centered DFT vs FFT reference path."""

import numpy as np
import jax.numpy as jnp

from mpc_sensorlessao_tpu.ops import dft, psf


def test_partial_dft_equals_fftshift_fft2():
    rng = np.random.default_rng(0)
    N, half = 64, 7
    X = (rng.normal(size=(N, N)) + 1j * rng.normal(size=(N, N))).astype(
        np.complex64)
    A = dft.centered_partial_dft(N, half)
    ours = np.asarray(dft.partial_centered_fft2(jnp.asarray(X), A))
    full = np.fft.fftshift(np.fft.fft2(np.fft.fftshift(X)))
    c = N // 2
    ref = full[c - half:c + half + 1, c - half:c + half + 1]
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-2)


def test_diversity_measurements_dft_matches_fft_path():
    rng = np.random.default_rng(1)
    R, half = 64, 7
    pupil = psf.pupil_mask(R)
    phase = jnp.asarray(rng.normal(size=(R, R)) * 0.3, jnp.float32)
    div = jnp.asarray(rng.normal(size=(3, R, R)) * 0.1, jnp.float32)
    scale = 1e-3
    y_fft = psf.diversity_measurements(phase, div, pupil, scale, half)
    A = dft.centered_partial_dft(R, half)
    y_dft = psf.diversity_measurements(phase, div, pupil, scale, half,
                                       dft_op=A)
    np.testing.assert_allclose(np.asarray(y_dft), np.asarray(y_fft),
                               rtol=1e-3, atol=1e-4)


def test_partial_dft_batched():
    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.normal(size=(5, 3, 32, 32)), jnp.complex64)
    A = dft.centered_partial_dft(32, 4)
    out = dft.partial_centered_fft2(X, A)
    assert out.shape == (5, 3, 9, 9)
