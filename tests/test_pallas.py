"""Pallas fused PSF kernel vs the jnp reference path (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from mpc_sensorlessao_tpu.ops import dft, pallas_kernels, psf


def test_fused_psf_kernel_matches_jnp_path():
    rng = np.random.default_rng(0)
    R, half, B = 64, 7, 5
    pupil = psf.pupil_mask(R)
    A = dft.centered_partial_dft(R, half)
    phase = jnp.asarray(rng.normal(size=(B, R, R)) * 0.4, jnp.float32)
    scale = 1e-3

    ref = psf.cropped_psf_intensity_dft(phase, pupil, A, scale)
    out = pallas_kernels.psf_crop_intensity(phase, pupil, A, scale,
                                            interpret=True)
    assert out.shape == (B, 2 * half + 1, 2 * half + 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=1e-5)


def test_fused_diversity_kernel_matches_unfused():
    """psf_crop_diversity (angle-addition fused path) == the reference
    jnp path, interpret mode."""
    import numpy as np
    import jax.numpy as jnp
    from mpc_sensorlessao_tpu.ops import dft, pallas_kernels, psf

    R, c = 64, 9
    rng = np.random.default_rng(0)
    phase = jnp.asarray(rng.normal(size=(3, R, R)) * 0.4, jnp.float32)
    div = jnp.asarray(rng.normal(size=(3, R, R)) * 0.8, jnp.float32)
    pupil = psf.pupil_mask(R)
    op = dft.centered_partial_dft(R, c)

    fused = pallas_kernels.psf_crop_diversity(
        phase, pupil, jnp.cos(div), jnp.sin(div), op, 2.0, interpret=True)
    ref = psf.cropped_psf_intensity_dft(
        phase[:, None] + div[None], pupil, op, 2.0)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_sym3_kernel_matches_general():
    """psf_crop_diversity_sym3 == general kernel on the symmetric triple
    (-a, 0, +a), and the diversity_measurements div_sym3 dispatch agrees
    with the unfused jnp path."""
    R, c, B, a = 64, 9, 4, 3.0
    rng = np.random.default_rng(1)
    phase = jnp.asarray(rng.normal(size=(B, R, R)) * 0.4, jnp.float32)
    zmap = jnp.asarray(rng.normal(size=(R, R)) * 0.5, jnp.float32)
    div = jnp.stack([-a * zmap, 0.0 * zmap, a * zmap])
    pupil = psf.pupil_mask(R)
    op = dft.centered_partial_dft(R, c)

    sym = pallas_kernels.psf_crop_diversity_sym3(
        phase, pupil, jnp.cos(a * zmap), jnp.sin(a * zmap), op, 2.0,
        interpret=True)
    gen = pallas_kernels.psf_crop_diversity(
        phase, pupil, jnp.cos(div), jnp.sin(div), op, 2.0, interpret=True)
    np.testing.assert_allclose(np.asarray(sym), np.asarray(gen),
                               rtol=2e-4, atol=2e-4)

    y_sym = psf.diversity_measurements(
        phase, div, pupil, 2.0, c, dft_op=op, use_pallas=True,
        div_cos=jnp.cos(div), div_sin=jnp.sin(div), div_sym3=True,
        pallas_interpret=True)
    y_ref = psf.diversity_measurements(phase, div, pupil, 2.0, c,
                                       dft_op=op)
    np.testing.assert_allclose(np.asarray(y_sym), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


def test_sym3_thin_kernel_matches_sym3():
    """The thin-row recombination variant is numerically the sym3 kernel
    (same math, zero R^2-sized copies)."""
    R, c, B, a = 64, 9, 4, 3.0
    rng = np.random.default_rng(2)
    phase = jnp.asarray(rng.normal(size=(B, R, R)) * 0.4, jnp.float32)
    zmap = jnp.asarray(rng.normal(size=(R, R)) * 0.5, jnp.float32)
    pupil = psf.pupil_mask(R)
    op = dft.centered_partial_dft(R, c)
    sym = pallas_kernels.psf_crop_diversity_sym3(
        phase, pupil, jnp.cos(a * zmap), jnp.sin(a * zmap), op, 2.0,
        interpret=True)
    thin = pallas_kernels.psf_crop_diversity_sym3_thin(
        phase, pupil, jnp.cos(a * zmap), jnp.sin(a * zmap), op, 2.0,
        interpret=True)
    np.testing.assert_allclose(np.asarray(thin), np.asarray(sym),
                               rtol=2e-5, atol=2e-5)
