"""Partial centered 2-D DFT as matmuls (the TPU-native FFT replacement).

The estimator needs only the central (2c+1)^2 crop of
fftshift(fft2(fftshift(P))) (reference: README.md:468-471).  On TPU the
right primitive is not an FFT at all: a *partial centered DFT*

    Y[u, v] = sum_{x,y} X[x, y] e^{-2pi i (u-c)(x-c)/N} e^{-2pi i (v-c)(y-c)/N}
            = (A X A^T)[u, v],     A in C^{w x N},  w = crop width << N

costs two thin complex matmuls (w*N^2 MACs) that map straight onto the
MXU, versus a full N^2 log N FFT of which all but w^2 outputs are thrown
away.  (This also sidesteps the axon PJRT backend, where XLA's FFT custom
call is unimplemented.)

The identity with the fftshift sandwich holds exactly for even N:
fft2(fftshift(X))[k] = sum_x X[x] e^{-2pi i k(x-c)/N}; re-centering the
output index k=(u+c) mod N multiplies by e^{-2pi i (x-c)} = 1.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=16)
def _centered_partial_dft_np(n: int, crop_half: int) -> np.ndarray:
    """A[u, x] = exp(-2pi i (u-c)(x-c)/n), u in [c-half, c+half]."""
    c = n // 2
    u = np.arange(c - crop_half, c + crop_half + 1)
    x = np.arange(n)
    phase = -2.0 * np.pi * np.outer(u - c, x - c) / n
    return np.exp(1j * phase).astype(np.complex64)


def centered_partial_dft(n: int, crop_half: int) -> jnp.ndarray:
    """(2, w, n) float32 device operator [real; imag], w = 2*crop_half+1.

    Stored as stacked real parts: complex64 arrays must never cross the
    host<->device boundary (the axon PJRT runtime has no complex transfer
    path); the complex operator is reassembled inside the compiled program.
    """
    A = _centered_partial_dft_np(n, crop_half)
    return jnp.asarray(np.stack([A.real, A.imag]), dtype=jnp.float32)


def partial_centered_fft2(field: jnp.ndarray, A_ri: jnp.ndarray) -> jnp.ndarray:
    """A @ field @ A.T for batched complex fields (..., N, N) -> (..., w, w).

    ``A_ri`` is the (2, w, N) real/imag stack from centered_partial_dft;
    ``field`` is complex built inside the surrounding jit.  Equals
    fftshift(fft2(fftshift(field)))[crop] exactly (see module docstring).
    XLA lowers the complex matmuls to real MXU matmuls.
    """
    A = jax.lax.complex(A_ri[0], A_ri[1])
    rows = jnp.einsum("un,...nm->...um", A, field)      # (..., w, N)
    return jnp.einsum("...um,vm->...uv", rows, A)       # (..., w, w)


def partial_centered_fft2_real(fr: jnp.ndarray, fi: jnp.ndarray,
                               A_ri: jnp.ndarray,
                               compute_dtype=None):
    """Same transform in explicit real arithmetic: (out_r, out_i).

    ``compute_dtype`` (e.g. jnp.bfloat16) casts the matmul *operands*
    while accumulating in float32 (preferred_element_type) -- the MXU's
    native mixed-precision mode, ~2x the fp32 matmul throughput.  The DFT
    operands are O(1) (twiddles and unit-modulus fields), so bf16's 8-bit
    mantissa costs ~0.4% relative spectrum error -- far below the
    estimator's 10 dB measurement-noise floor (see EstimatorConfig
    dft_dtype).  None keeps float32 operands (bit-compatible with the
    complex path up to reassociation).
    """
    are, aim = A_ri[0], A_ri[1]
    if compute_dtype is not None:
        fr = fr.astype(compute_dtype)
        fi = fi.astype(compute_dtype)
        are = are.astype(compute_dtype)
        aim = aim.astype(compute_dtype)

    def mm(a, b, sub):      # einsum with f32 accumulation
        return jnp.einsum(sub, a, b,
                          preferred_element_type=jnp.float32)

    rr = mm(are, fr, "un,...nm->...um") - mm(aim, fi, "un,...nm->...um")
    ri = mm(are, fi, "un,...nm->...um") + mm(aim, fr, "un,...nm->...um")
    if compute_dtype is not None:
        rr = rr.astype(compute_dtype)
        ri = ri.astype(compute_dtype)
    out_r = (mm(rr, are, "...um,vm->...uv")
             - mm(ri, aim, "...um,vm->...uv"))
    out_i = (mm(rr, aim, "...um,vm->...uv")
             + mm(ri, are, "...um,vm->...uv"))
    return out_r, out_i
