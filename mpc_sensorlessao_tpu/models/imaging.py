"""Detector noise model + science imager metrics.

TPU-native equivalent of the reference's bundled-but-unused imaging
chain (SURVEY.md 2d): `detector.m` (367 LoC) and `imager.m` (168 LoC).
The sensorless pipeline injects precomputed SNR-10dB noise instead
(README.md:473-475); these components complete the camera capability
surface for the WFS models (pyramid.m's camera is a detector) and for
science-path evaluation.

Reference semantics replicated:

* detector.m:299-304  -- intensity binning to the detector resolution
  (utilities.binning: block sums, flux-preserving);
* detector.m:305-311  -- frame integration over `exposure_frames` ticks;
* detector.m:315-321  -- noise chain order: Poisson photon noise on
  (image + background), background subtracted, THEN quantum efficiency,
  THEN additive Gaussian readout noise;
* detector.m:9-15     -- photonNoise off / readOutNoise 0 / QE 1
  defaults;
* imager.m:98-115     -- Strehl ratio as the OTF-volume ratio
  sum(OTF_AO)/sum(OTF_DL).  The OTF volume equals the PSF peak over the
  total flux, so it is computed here peak/flux-normalized without any
  Fourier transform;
* imager.m:117-126    -- encircled energy within a square of given
  width centered on the diffraction peak (the commented-out eeFilter
  semantics, evaluated directly in the image plane).

TPU-first: `expose` is jit/vmap-friendly (static shapes, jax.random
noise keys, reshape-sum binning) so a whole Monte-Carlo batch of frames
is one program; metrics are simple reductions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DetectorConfig(NamedTuple):
    """detector.m knobs (detector.m:9-15,63)."""

    resolution: int                 # output frame is resolution x resolution
    photon_noise: bool = False
    read_out_noise: float = 0.0     # e- rms per pixel
    quantum_efficiency: float = 1.0
    n_photon_background: float = 0.0
    exposure_frames: int = 1        # frames integrated per readout


def bin_frame(image: jnp.ndarray, resolution: int) -> jnp.ndarray:
    """Flux-preserving block binning (utilities.binning via
    detector.m:299-304).  Input side must be a multiple of resolution."""
    n = image.shape[-1]
    if n == resolution:
        return image
    b = n // resolution
    lead = image.shape[:-2]
    return image.reshape(*lead, resolution, b, resolution, b).sum(
        axis=(-3, -1))


def read_out(cfg: DetectorConfig, key, image: jnp.ndarray) -> jnp.ndarray:
    """Apply the detector noise chain to an integrated intensity frame
    (detector.m:292-330)."""
    image = bin_frame(image, cfg.resolution)
    if cfg.photon_noise:
        key, sub = jax.random.split(key)
        image = jax.random.poisson(
            sub, image + cfg.n_photon_background).astype(jnp.float32) \
            - cfg.n_photon_background
    image = cfg.quantum_efficiency * image
    if cfg.read_out_noise > 0:
        image = image + cfg.read_out_noise * jax.random.normal(
            key, image.shape, dtype=jnp.float32)
    return image


def expose(cfg: DetectorConfig, key, frames: jnp.ndarray) -> jnp.ndarray:
    """Integrate `exposure_frames` intensity frames then read out once
    (detector.m:305-311).  frames: (T, n, n) with T >= exposure_frames."""
    acc = jnp.sum(frames[:cfg.exposure_frames], axis=0)
    return read_out(cfg, key, acc)


# ------------------------------------------------------------------ imager

def strehl_ratio(image: jnp.ndarray, reference: jnp.ndarray,
                 center: bool = False) -> jnp.ndarray:
    """OTF-volume Strehl (imager.m:115): sum(OTF_AO)/sum(OTF_DL).

    The OTF volume is the flux-normalized PSF peak, so no transform is
    needed: S = (peak/flux)_image / (peak/flux)_reference.

    ``center=False`` (default) takes the frame maximum as the peak --
    exact only for NOISELESS frames (detector noise biases the maximum
    high) but robust to residual tip/tilt shifting the peak off-center.
    ``center=True`` samples the known on-axis pixel instead: unbiased
    under zero-mean noise, assumes a centered PSF (use it on noisy
    frames of a tip/tilt-stabilized path).
    """
    if center:
        ci, cj = image.shape[-2] // 2, image.shape[-1] // 2
        pk_i = image[..., ci, cj] / jnp.sum(image, axis=(-2, -1))
        cr_i, cr_j = reference.shape[-2] // 2, reference.shape[-1] // 2
        pk_r = reference[..., cr_i, cr_j] / jnp.sum(reference,
                                                    axis=(-2, -1))
    else:
        pk_i = jnp.max(image) / jnp.sum(image)
        pk_r = jnp.max(reference) / jnp.sum(reference)
    return pk_i / pk_r


def encircled_energy(image: jnp.ndarray, width: int) -> jnp.ndarray:
    """Fraction of total flux inside a centered width x width window
    (imager.m:117-126 eeFilter semantics, image-plane form)."""
    n = image.shape[-1]
    c = n // 2
    h = width // 2
    win = image[..., c - h:c + h + width % 2, c - h:c + h + width % 2]
    return jnp.sum(win, axis=(-2, -1)) / jnp.sum(image, axis=(-2, -1))


class ImagerResult(NamedTuple):
    frame: jnp.ndarray
    strehl: jnp.ndarray
    ee: jnp.ndarray


def imager(cfg: DetectorConfig, key, frames: jnp.ndarray,
           reference: jnp.ndarray, ee_width: int = 4) -> ImagerResult:
    """Science camera: expose + Strehl + encircled energy
    (imager.m:70-130)."""
    frame = expose(cfg, key, frames)
    ref = bin_frame(reference, cfg.resolution)
    return ImagerResult(frame=frame,
                        strehl=strehl_ratio(frame, ref),
                        ee=encircled_energy(frame, ee_width))
