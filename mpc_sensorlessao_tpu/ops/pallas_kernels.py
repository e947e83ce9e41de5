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
                scale: float, compute_dtype=None):
    phase = phase_ref[0]
    pup = pupil_ref[:]
    fr = pup * jnp.cos(phase)
    fi = pup * jnp.sin(phase)
    are = are_ref[:]
    aim = aim_ref[:]
    if compute_dtype is not None:
        # bf16 matmul operands, f32 accumulation (native MXU mixed
        # precision, ~2x fp32 matmul throughput; see
        # dft.partial_centered_fft2_real for the error budget)
        dt = jnp.dtype(compute_dtype)
        fr = fr.astype(dt)
        fi = fi.astype(dt)
        are = are.astype(dt)
        aim = aim.astype(dt)
    # rows = A @ field  (w, R), complex via real parts
    rr = (jnp.dot(are, fr, preferred_element_type=jnp.float32)
          - jnp.dot(aim, fi, preferred_element_type=jnp.float32))
    ri = (jnp.dot(are, fi, preferred_element_type=jnp.float32)
          + jnp.dot(aim, fr, preferred_element_type=jnp.float32))
    if compute_dtype is not None:
        dt = jnp.dtype(compute_dtype)
        rr = rr.astype(dt)
        ri = ri.astype(dt)
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


def _psf_div_kernel(phase_ref, pupil_ref, cosd_ref, sind_ref, are_ref,
                    aim_ref, out_ref, *, scale: float, n_div: int,
                    chunk: int, compute_dtype=None):
    """All diversities of a CHUNK of scenarios in one program.

    cos/sin of the residual phase are computed ONCE per scenario and
    combined with the precomputed diversity cos/sin maps by the
    angle-addition identity (3x fewer transcendentals than
    cos(phase + zd Z4) per diversity); the (B, n_div, R, R) summed-phase
    tensor of the unfused path is never materialized in HBM; and the
    6-plus-MB of per-program constants (pupil, diversity maps, DFT
    operators) are amortized over `chunk` scenarios.
    """
    pup = pupil_ref[:]
    w = are_ref.shape[0]
    R = pup.shape[-1]
    # pack real/imag DFT operators into one (2w, R) operand: every
    # complex product becomes slices of ONE matmul with twice the MXU
    # sublane occupancy (w=31 alone uses 31/128 rows)
    A2 = jnp.concatenate([are_ref[:], aim_ref[:]], axis=0)    # (2w, R)
    dt = jnp.dtype(compute_dtype) if compute_dtype is not None else None
    if dt is not None:
        A2 = A2.astype(dt)
    dn = (((1,), (1,)), ((), ()))
    for b in range(chunk):
        p = phase_ref[b]
        cp = jnp.cos(p)
        sp = jnp.sin(p)
        for d in range(n_div):
            cd = cosd_ref[d]
            sd = sind_ref[d]
            fr = pup * (cp * cd - sp * sd)
            fi = pup * (sp * cd + cp * sd)
            F = jnp.concatenate([fr, fi], axis=1)             # (R, 2R)
            if dt is not None:
                F = F.astype(dt)
            # S1 = A2 @ F: [are|aim] x [fr|fi] -> 4 products at once
            S1 = jnp.dot(A2, F, preferred_element_type=jnp.float32)
            rr = S1[:w, :R] - S1[w:, R:]      # are fr - aim fi
            ri = S1[:w, R:] + S1[w:, :R]      # are fi + aim fr
            G = jnp.concatenate([rr, ri], axis=0)             # (2w, R)
            if dt is not None:
                G = G.astype(dt)
            S2 = jax.lax.dot_general(G, A2, dn,
                                     preferred_element_type=jnp.float32)
            orr = S2[:w, :w] - S2[w:, w:]     # rr are' - ri aim'
            oi = S2[:w, w:] + S2[w:, :w]      # rr aim' + ri are'
            out_ref[b, d] = (orr * orr + oi * oi) * scale


def _psf_div3_sym_kernel(phase_ref, pupil_ref, pcd_ref, psd_ref, are_ref,
                         aim_ref, out_ref, *, scale: float, chunk: int,
                         compute_dtype=None):
    """Symmetric diversity triple (-a, 0, +a) of a CHUNK of scenarios.

    Exploits cos(-a Z) = cos(a Z), sin(-a Z) = -sin(a Z): with
    pcd = pupil cos(a Z4), psd = pupil sin(a Z4) precomputed, the three
    diversity fields are +/- combinations of FOUR products of the
    scenario cos/sin with constant maps -- and because the DFT stage is
    linear, the +/- combination is applied AFTER the matmul on the thin
    (2w, 2R) row intermediate instead of on R^2 fields.  Per scenario:
    6 R^2 multiplies and 0 R^2 adds (vs 12 and 6 for the general
    kernel), and the per-program constant set shrinks from 7 to 3 maps
    (bigger scenario chunks in the same VMEM budget).
    """
    pup = pupil_ref[:]
    w = are_ref.shape[0]
    R = pup.shape[-1]
    A2 = jnp.concatenate([are_ref[:], aim_ref[:]], axis=0)    # (2w, R)
    dt = jnp.dtype(compute_dtype) if compute_dtype is not None else None
    if dt is not None:
        A2 = A2.astype(dt)
    dn = (((1,), (1,)), ((), ()))
    pcd = pcd_ref[:]
    psd = psd_ref[:]

    def crop(S1):
        rr = S1[:w, :R] - S1[w:, R:]
        ri = S1[:w, R:] + S1[w:, :R]
        G = jnp.concatenate([rr, ri], axis=0)                 # (2w, R)
        if dt is not None:
            G = G.astype(dt)
        S2 = jax.lax.dot_general(G, A2, dn,
                                 preferred_element_type=jnp.float32)
        orr = S2[:w, :w] - S2[w:, w:]
        oi = S2[:w, w:] + S2[w:, :w]
        return (orr * orr + oi * oi) * scale

    for b in range(chunk):
        p = phase_ref[b]
        cp = jnp.cos(p)
        sp = jnp.sin(p)
        # field(+a) = (t1 - t2, t3 + t4); field(-a) = (t1 + t2, t3 - t4)
        T13 = jnp.concatenate([cp * pcd, sp * pcd], axis=1)   # (R, 2R)
        T24 = jnp.concatenate([sp * psd, cp * psd], axis=1)   # (R, 2R)
        F0 = jnp.concatenate([pup * cp, pup * sp], axis=1)    # (R, 2R)
        if dt is not None:
            T13 = T13.astype(dt)
            T24 = T24.astype(dt)
            F0 = F0.astype(dt)
        U = jnp.dot(A2, T13, preferred_element_type=jnp.float32)
        W = jnp.dot(A2, T24, preferred_element_type=jnp.float32)
        # S1(+/-a) = [U_L -/+ W_L | U_R +/- W_R] on the (2w, 2R) rows
        Sm = jnp.concatenate([U[:, :R] + W[:, :R],
                              U[:, R:] - W[:, R:]], axis=1)
        Sp = jnp.concatenate([U[:, :R] - W[:, :R],
                              U[:, R:] + W[:, R:]], axis=1)
        out_ref[b, 0] = crop(Sm)
        out_ref[b, 1] = crop(
            jnp.dot(A2, F0, preferred_element_type=jnp.float32))
        out_ref[b, 2] = crop(Sp)


def _psf_div3_sym_thin_kernel(phase_ref, pupil_ref, pcd_ref, psd_ref,
                              are_ref, aim_ref, out_ref, *, scale: float,
                              chunk: int, compute_dtype=None):
    """sym3 with the +/- recombination done ENTIRELY on thin rows.

    The base sym3 kernel concatenates the four (R, R) products into
    (R, 2R) packed operands -- 6 R^2 VMEM copies per scenario on top of
    the 6 R^2 required multiplies.  Here each product feeds the packed
    DFT matmul directly (6 matmuls of (2w, R) x (R, R), same FLOPs as
    the 3 packed ones) and every +/- combination happens on (w, R) row
    intermediates (2w R << R^2).  Zero R^2-sized copies.
    """
    pup = pupil_ref[:]
    w = are_ref.shape[0]
    A2 = jnp.concatenate([are_ref[:], aim_ref[:]], axis=0)    # (2w, R)
    dt = jnp.dtype(compute_dtype) if compute_dtype is not None else None
    if dt is not None:
        A2 = A2.astype(dt)
    dn = (((1,), (1,)), ((), ()))
    pcd = pcd_ref[:]
    psd = psd_ref[:]

    def crop(rr, ri):
        G = jnp.concatenate([rr, ri], axis=0)                 # (2w, R)
        if dt is not None:
            G = G.astype(dt)
        S2 = jax.lax.dot_general(G, A2, dn,
                                 preferred_element_type=jnp.float32)
        orr = S2[:w, :w] - S2[w:, w:]
        oi = S2[:w, w:] + S2[w:, :w]
        return (orr * orr + oi * oi) * scale

    def mm(x):
        if dt is not None:
            x = x.astype(dt)
        return jnp.dot(A2, x, preferred_element_type=jnp.float32)

    for b in range(chunk):
        p = phase_ref[b]
        cp = jnp.cos(p)
        sp = jnp.sin(p)
        # U_k = [Are; Aim] @ t_k for the four diversity products and the
        # two zero-diversity fields
        U1 = mm(cp * pcd)
        U2 = mm(sp * psd)
        U3 = mm(sp * pcd)
        U4 = mm(cp * psd)
        F0r = mm(pup * cp)
        F0i = mm(pup * sp)
        # field(+a) = (t1 - t2) + i (t3 + t4); field(-a) = conj-pattern
        # rr = Are fr - Aim fi, ri = Are fi + Aim fr  on thin rows
        out_ref[b, 0] = crop(U1[:w] + U2[:w] - U3[w:] + U4[w:],
                             U3[:w] - U4[:w] + U1[w:] + U2[w:])
        out_ref[b, 1] = crop(F0r[:w] - F0i[w:], F0i[:w] + F0r[w:])
        out_ref[b, 2] = crop(U1[:w] - U2[:w] - U3[w:] - U4[w:],
                             U3[:w] + U4[:w] + U1[w:] - U2[w:])


@functools.partial(jax.jit,
                   static_argnames=("scale", "interpret", "compute_dtype"))
def psf_crop_diversity_sym3_thin(phase, pupil, cos_a, sin_a, dft_op,
                                 scale: float, interpret: bool = False,
                                 compute_dtype: str | None = None):
    """sym3 variant with thin-row recombination (see the kernel
    docstring); same signature/semantics as psf_crop_diversity_sym3."""
    B, R, _ = phase.shape
    w = dft_op.shape[1]
    pcd = pupil * cos_a
    psd = pupil * sin_a
    itm = R * R * 4
    const = 3 * itm + 4 * w * R * 4
    # scratch: cos/sin + one live product (the six matmul operands are
    # consumed one at a time)
    budget = int((15.5 * 1024 * 1024 - const - 4 * itm) // (2 * itm))
    chunk = max(1, min(8, budget))
    while B % chunk:
        chunk -= 1
    kernel = functools.partial(_psf_div3_sym_thin_kernel, scale=scale,
                               chunk=chunk, compute_dtype=compute_dtype)
    return pl.pallas_call(
        kernel,
        grid=(B // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, R, R), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, R), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, R), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, R), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, R), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, R), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, 3, w, w),
                               lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, w, w), jnp.float32),
        interpret=interpret,
    )(phase.astype(jnp.float32), pupil.astype(jnp.float32),
      pcd.astype(jnp.float32), psd.astype(jnp.float32),
      dft_op[0], dft_op[1])


@functools.partial(jax.jit,
                   static_argnames=("scale", "interpret", "compute_dtype"))
def psf_crop_diversity_sym3(phase, pupil, cos_a, sin_a, dft_op,
                            scale: float, interpret: bool = False,
                            compute_dtype: str | None = None):
    """Fused diversity-PSF crops for the symmetric triple (-a, 0, +a).

    ``cos_a``/``sin_a`` are cos/sin of the POSITIVE diversity map
    (a * Z_defocus); outputs are ordered (-a, 0, +a) to match
    `psf_crop_diversity` with the reference's zd stack (README.md:461).
    """
    B, R, _ = phase.shape
    w = dft_op.shape[1]
    pcd = pupil * cos_a
    psd = pupil * sin_a
    itm = R * R * 4
    # constants: pupil + pcd + psd + DFT operators; ~6 R^2 floats of
    # kernel scratch (cos/sin + the packed (R, 2R) operands)
    const = 3 * itm + 4 * w * R * 4
    budget = int((15.5 * 1024 * 1024 - const - 6 * itm) // (2 * itm))
    chunk = max(1, min(8, budget))
    while B % chunk:
        chunk -= 1
    kernel = functools.partial(_psf_div3_sym_kernel, scale=scale,
                               chunk=chunk, compute_dtype=compute_dtype)
    return pl.pallas_call(
        kernel,
        grid=(B // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, R, R), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, R), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, R), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, R), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, R), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, R), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, 3, w, w),
                               lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, w, w), jnp.float32),
        interpret=interpret,
    )(phase.astype(jnp.float32), pupil.astype(jnp.float32),
      pcd.astype(jnp.float32), psd.astype(jnp.float32),
      dft_op[0], dft_op[1])


@functools.partial(jax.jit,
                   static_argnames=("scale", "interpret", "compute_dtype"))
def psf_crop_diversity(phase, pupil, div_cos, div_sin, dft_op,
                       scale: float, interpret: bool = False,
                       compute_dtype: str | None = None):
    """Fused diversity-PSF crops: (B, R, R) phase -> (B, n_div, w, w).

    Scenarios are processed in chunks per grid program to amortize the
    constant operands; diversities unrolled inside VMEM (the hot
    estimator measurement, README.md:461-471).
    """
    B, R, _ = phase.shape
    n_div = div_cos.shape[0]
    w = dft_op.shape[1]
    # VMEM budget: the scenario block is DOUBLE-buffered across grid
    # steps (2 chunk R^2 floats); constants (pupil + 2 n_div diversity
    # maps + DFT operators) are single-buffered; ~2.7 R^2 floats of
    # kernel scratch (cos/sin, F, S1, G -- measured from the compiler's
    # scoped-vmem report).  Keep the total inside the 16MB scoped limit.
    # Chunk size itself is perf-NEUTRAL (measured 27.8 vs 28.3 us/scen at
    # R=512 chunk 2 vs 1 on v5e) -- this bound is purely about fitting.
    itm = R * R * 4
    const = (2 * n_div + 1) * itm + 4 * w * R * 4
    budget = int((15.5 * 1024 * 1024 - const - 2.7 * itm) // (2 * itm))
    chunk = max(1, min(8, budget))
    while B % chunk:
        chunk -= 1
    kernel = functools.partial(_psf_div_kernel, scale=scale, n_div=n_div,
                               chunk=chunk, compute_dtype=compute_dtype)
    return pl.pallas_call(
        kernel,
        grid=(B // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, R, R), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, R), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_div, R, R), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_div, R, R), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, R), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, R), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, n_div, w, w),
                               lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_div, w, w), jnp.float32),
        interpret=interpret,
    )(phase.astype(jnp.float32), pupil.astype(jnp.float32),
      div_cos.astype(jnp.float32), div_sin.astype(jnp.float32),
      dft_op[0], dft_op[1])


@functools.partial(jax.jit,
                   static_argnames=("scale", "interpret", "compute_dtype"))
def psf_crop_intensity(phase, pupil, dft_op, scale: float,
                       interpret: bool = False,
                       compute_dtype: str | None = None):
    """Batched fused PSF crop intensities.

    phase: (B, R, R) float32 residual+diversity phases;
    pupil: (R, R) float32; dft_op: (2, w, R) from ops.dft.
    ``compute_dtype``: None (f32) or "bfloat16" matmul operands.
    Returns (B, w, w) cropped PSF intensities * scale.
    """
    B, R, _ = phase.shape
    w = dft_op.shape[1]
    kernel = functools.partial(_psf_kernel, scale=scale,
                               compute_dtype=compute_dtype)
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
