"""Phase-diversity PSF formation.

TPU-native equivalent of the reference's estimator measurement path
(reference: README.md:366-397,457-475): for each defocus diversity zd in
{-zd, 0, +zd} form  P = pupil .* exp(1i (phi_res + zd Z_defocus)),
I = |fftshift(fft2(fftshift(P))) dx^2|^2, crop the central (2c+1)^2 window,
scale by AU and stack -- here as one batched FFT over
(... , diversity, R, R) so thousands of scenarios ride a single XLA FFT.

Measurement vectors use MATLAB column-major flattening of each crop
(reference: README.md:471 `reshape(v_im, diff^2, 1)`) so that regenerated
A_s/b_s match the shipped model_approx.mat layout.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from . import dft


@lru_cache(maxsize=8)
def pupil_mask_np(resolution: int) -> np.ndarray:
    """Circular pin-hole pupil on the centered frequency grid.

    Reference: README.md:383-391 -- fxaxis=((-len/2):(len/2-1))*df,
    pupil = (FX^2+FY^2 <= ((len/2-1)*df)^2).  In pixel units: disc of
    radius R/2-1 centered at index R/2.
    """
    R = resolution
    ax = np.arange(R) - R // 2
    FX, FY = np.meshgrid(ax, -ax)
    return (FX * FX + FY * FY) <= (R // 2 - 1) ** 2


def pupil_mask(resolution: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(pupil_mask_np(resolution), dtype=dtype)


def psf_intensity(
    phase: jnp.ndarray,
    pupil: jnp.ndarray,
    scale: float,
) -> jnp.ndarray:
    """|fftshift(fft2(fftshift(pupil e^{i phase})))|^2 * scale.

    phase: (..., R, R).  ``scale`` folds dx^4 * AU (README.md:468-470).
    """
    field = pupil * jnp.exp(1j * phase.astype(jnp.float32))
    shifted = jnp.fft.fftshift(
        jnp.fft.fft2(jnp.fft.fftshift(field, axes=(-2, -1))), axes=(-2, -1))
    return (shifted.real ** 2 + shifted.imag ** 2) * scale


def crop_center(im: jnp.ndarray, half: int) -> jnp.ndarray:
    """Central (2*half+1)^2 window around pixel R//2 (README.md:378-380)."""
    R = im.shape[-1]
    c = R // 2
    return im[..., c - half:c + half + 1, c - half:c + half + 1]


def measurement_vector(crops: jnp.ndarray) -> jnp.ndarray:
    """Stack diversity crops into the measurement vector y.

    crops: (..., n_div, w, w) -> (..., n_div*w*w), each crop flattened
    column-major (MATLAB reshape convention, README.md:471).
    """
    w = crops.shape[-1]
    nd = crops.shape[-3]
    colmajor = jnp.swapaxes(crops, -1, -2)  # transpose each crop
    return colmajor.reshape(*crops.shape[:-3], nd * w * w)


def cropped_psf_intensity_dft(
    phase: jnp.ndarray,
    pupil: jnp.ndarray,
    dft_op: jnp.ndarray,
    scale: float,
    compute_dtype=None,
) -> jnp.ndarray:
    """PSF crop via partial centered DFT matmuls (ops.dft) -- the
    TPU-native hot path: only the (2c+1)^2 window the estimator consumes
    is ever computed (vs the reference's full 512^2 FFT, README.md:468).

    ``compute_dtype`` selects reduced-precision matmul operands
    (dft.partial_centered_fft2_real); None = float32 complex path.
    """
    if compute_dtype is None:
        field = pupil * jnp.exp(1j * phase.astype(jnp.float32))
        spec = dft.partial_centered_fft2(field, dft_op)
        return (spec.real ** 2 + spec.imag ** 2) * scale
    ph = phase.astype(jnp.float32)
    fr = pupil * jnp.cos(ph)
    fi = pupil * jnp.sin(ph)
    out_r, out_i = dft.partial_centered_fft2_real(
        fr, fi, dft_op, compute_dtype=compute_dtype)
    out_r = out_r.astype(jnp.float32)
    out_i = out_i.astype(jnp.float32)
    return (out_r ** 2 + out_i ** 2) * scale


def diversity_measurements(
    phase_res: jnp.ndarray,
    diversity_phases: jnp.ndarray,
    pupil: jnp.ndarray,
    scale: float,
    crop_half: int,
    dft_op: jnp.ndarray | None = None,
    use_pallas: bool = False,
    compute_dtype=None,
    div_cos: jnp.ndarray | None = None,
    div_sin: jnp.ndarray | None = None,
    div_sym3: bool = False,
    pallas_interpret: bool = False,
) -> jnp.ndarray:
    """Full measurement path: residual phase(s) -> stacked PSF vector(s).

    phase_res: (..., R, R); diversity_phases: (n_div, R, R) precomputed
    zd * Z_defocus maps (README.md:462-464).  Returns (..., p).

    With ``dft_op`` (from ops.dft.centered_partial_dft) the crop is
    computed directly by partial-DFT matmuls (TPU path); otherwise via
    full FFT2 + crop (CPU/reference-parity path).  Both are bit-equal up
    to float roundoff (tested).

    ``div_sym3=True`` asserts the diversity stack is the symmetric triple
    (-a, 0, +a) (the reference's zd set, README.md:461) and dispatches the
    even/odd-symmetry kernel (psf_crop_diversity_sym3: ~25% faster on v5e,
    8.5 vs 11.3 us/scenario at R=512 measured inside scans).
    """
    if dft_op is not None and use_pallas and div_cos is not None:
        # fused kernel: diversity addition + cos/sin + DFT + crop all in
        # VMEM (the (B, n_div, R, R) sum is never materialized)
        from . import pallas_kernels
        lead = phase_res.shape[:-2]
        R = phase_res.shape[-1]
        flat = phase_res.reshape((-1, R, R))
        cdt = "bfloat16" if compute_dtype == jnp.bfloat16 else None
        if div_sym3 and div_cos.shape[0] == 3:
            crops = pallas_kernels.psf_crop_diversity_sym3(
                flat, pupil, div_cos[2], div_sin[2], dft_op, scale,
                compute_dtype=cdt, interpret=pallas_interpret)
        else:
            crops = pallas_kernels.psf_crop_diversity(
                flat, pupil, div_cos, div_sin, dft_op, scale,
                compute_dtype=cdt, interpret=pallas_interpret)
        w = crops.shape[-1]
        return measurement_vector(
            crops.reshape(*lead, div_cos.shape[0], w, w))
    total = phase_res[..., None, :, :] + diversity_phases
    if dft_op is not None:
        if use_pallas:
            from . import pallas_kernels
            lead = total.shape[:-2]
            R = total.shape[-1]
            flat = total.reshape((-1, R, R))
            crops = pallas_kernels.psf_crop_intensity(
                flat, pupil, dft_op, scale,
                compute_dtype=("bfloat16" if compute_dtype == jnp.bfloat16
                               else None))
            w = crops.shape[-1]
            crops = crops.reshape(*lead, w, w)
        else:
            crops = cropped_psf_intensity_dft(total, pupil, dft_op, scale,
                                              compute_dtype=compute_dtype)
    else:
        im = psf_intensity(total, pupil, scale)
        crops = crop_center(im, crop_half)
    return measurement_vector(crops)
