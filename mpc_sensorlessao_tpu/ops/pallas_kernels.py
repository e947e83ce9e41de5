"""Pallas TPU kernels for the hot compute path.

`psf_crop_intensity`: the per-step estimator measurement fused into one
kernel -- phase -> pupil-masked complex field (VPU cos/sin) -> partial
centered DFT (two thin complex matmuls on the MXU, real arithmetic) ->
cropped intensity.  XLA cannot fuse transcendentals into MXU operands, so
the unfused path materializes the 2x R^2 complex field and the row
intermediate in HBM for every (scenario x diversity) item; this kernel
keeps everything in VMEM and writes only the (2c+1)^2 crop.

Used on TPU backends; the jnp path in ops.psf is the CPU/autodiff
reference (bit-compatible up to float reassociation, tested in interpret
mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _psf_kernel(phase_ref, pupil_ref, are_ref, aim_ref, out_ref, *,
                scale: float):
    phase = phase_ref[0]
    pup = pupil_ref[:]
    fr = pup * jnp.cos(phase)
    fi = pup * jnp.sin(phase)
    are = are_ref[:]
    aim = aim_ref[:]
    # rows = A @ field  (w, R), complex via real parts
    rr = (jnp.dot(are, fr, preferred_element_type=jnp.float32)
          - jnp.dot(aim, fi, preferred_element_type=jnp.float32))
    ri = (jnp.dot(are, fi, preferred_element_type=jnp.float32)
          + jnp.dot(aim, fr, preferred_element_type=jnp.float32))
    # out = rows @ A.T  (w, w)
    dn = (((1,), (1,)), ((), ()))
    orr = (jax.lax.dot_general(rr, are, dn,
                               preferred_element_type=jnp.float32)
           - jax.lax.dot_general(ri, aim, dn,
                                 preferred_element_type=jnp.float32))
    oi = (jax.lax.dot_general(rr, aim, dn,
                              preferred_element_type=jnp.float32)
          + jax.lax.dot_general(ri, are, dn,
                                preferred_element_type=jnp.float32))
    out_ref[0] = (orr * orr + oi * oi) * scale


@functools.partial(jax.jit,
                   static_argnames=("scale", "interpret"))
def psf_crop_intensity(phase, pupil, dft_op, scale: float,
                       interpret: bool = False):
    """Batched fused PSF crop intensities.

    phase: (B, R, R) float32 residual+diversity phases;
    pupil: (R, R) float32; dft_op: (2, w, R) from ops.dft.
    Returns (B, w, w) cropped PSF intensities * scale.
    """
    B, R, _ = phase.shape
    w = dft_op.shape[1]
    kernel = functools.partial(_psf_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, R, R), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, R), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, R), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, R), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, w, w), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, w, w), jnp.float32),
        interpret=interpret,
    )(phase.astype(jnp.float32), pupil.astype(jnp.float32),
      dft_op[0], dft_op[1])
