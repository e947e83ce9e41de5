"""Shack-Hartmann WFS + slope reconstructors + KL modes
(OOMAO shackHartmann / linearMMSE / karhunenLoeve capability)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mpc_sensorlessao_tpu.models import wfs
from mpc_sensorlessao_tpu.ops import karhunen_loeve, zernike, zernike_stats
from mpc_sensorlessao_tpu.utils.config import AtmosphereConfig

R = 64
NL = 8


@pytest.fixture(scope="module")
def sh():
    return wfs.build(R, n_lenslet=NL)


@pytest.fixture(scope="module")
def basis64():
    return zernike.make_basis(4, R)      # 15 modes


def test_geometric_slopes_of_tilt(sh):
    a = 0.03                              # rad / px along x
    x = jnp.arange(R, dtype=jnp.float32)
    phase = jnp.broadcast_to(a * x, (R, R))
    s = np.asarray(wfs.geometric_slopes(sh, phase))
    nv = sh.n_valid
    # edge subapertures touch grid columns 0 / R-1 where the centered
    # difference is skipped -> ~2% low there
    np.testing.assert_allclose(s[:nv], a, rtol=2e-2)      # x slopes
    np.testing.assert_allclose(s[nv:], 0.0, atol=1e-6)    # y slopes


def test_diffractive_slopes_track_geometric(sh, basis64):
    """Spot centroids are proportional to mean gradients for small
    aberrations: one global scale (sub/(2 pi) bins per rad/px)."""
    rng = np.random.default_rng(0)
    coeffs = jnp.asarray(
        np.concatenate([[0.0], 0.2 * rng.normal(size=14)]), jnp.float32)
    phase = zernike.synthesize(basis64, coeffs)
    g = np.asarray(wfs.geometric_slopes(sh, phase))
    d = np.asarray(wfs.diffractive_slopes(sh, phase))
    mask = np.abs(g) > 0.01
    ratio = d[mask] / g[mask]
    assert np.median(np.abs(ratio - 1.0)) < 0.25, np.median(ratio)


def test_ls_reconstruction_roundtrip(sh, basis64):
    stack = basis64.stack[1:]             # 14 modes, piston out
    D = wfs.interaction_matrix(sh, stack)
    assert D.shape == (sh.n_slopes, 14)
    Rop = wfs.ls_reconstructor(D)
    rng = np.random.default_rng(1)
    x = jnp.asarray(0.1 * rng.normal(size=14), jnp.float32)
    phase = jnp.einsum("k,kij->ij", x, stack)
    s = wfs.geometric_slopes(sh, phase)
    x_hat = np.asarray(wfs.reconstruct(Rop, s))
    np.testing.assert_allclose(x_hat, np.asarray(x), atol=5e-3)


def test_mmse_beats_ls_at_low_snr(sh, basis64):
    stack = basis64.stack[1:]
    D = wfs.interaction_matrix(sh, stack)
    atm = AtmosphereConfig()
    C = zernike_stats.coefficient_covariance(atm, 1.0, 4, resolution=48)
    C = C[1:, 1:]
    noise_var = 0.05 ** 2
    R_ls = wfs.ls_reconstructor(D)
    R_mm = wfs.mmse_reconstructor(D, C, noise_var)

    rng = np.random.default_rng(2)
    Lc = np.linalg.cholesky(C + 1e-12 * np.eye(14))
    e_ls, e_mm = [], []
    for i in range(30):
        x = Lc @ rng.standard_normal(14)
        s = np.asarray(D) @ x + np.sqrt(noise_var) * rng.standard_normal(
            sh.n_slopes)
        s = jnp.asarray(s, jnp.float32)
        e_ls.append(np.linalg.norm(
            np.asarray(wfs.reconstruct(R_ls, s)) - x))
        e_mm.append(np.linalg.norm(
            np.asarray(wfs.reconstruct(R_mm, s)) - x))
    assert np.mean(e_mm) < np.mean(e_ls)


def test_diffractive_interaction_matrix(sh, basis64):
    stack = basis64.stack[1:3]            # tip/tilt-ish pair
    D = wfs.interaction_matrix(sh, stack, diffractive=True)
    assert D.shape == (sh.n_slopes, 2)
    assert np.isfinite(np.asarray(D)).all()
    # each poke moves spots somewhere
    assert np.abs(np.asarray(D)).max() > 1e-3


def test_kl_basis_properties(basis64):
    atm = AtmosphereConfig()
    kl = karhunen_loeve.make_basis(atm, 1.0, 4, grid_basis=basis64)
    v = np.asarray(kl.variances)
    assert (np.diff(v) <= 1e-6).all()                 # descending
    # variance conservation: sum of KL variances = trace of Zernike cov
    C = zernike_stats.coefficient_covariance(atm, 1.0, 4, resolution=48)
    assert abs(v.sum() / np.trace(C[1:, 1:]) - 1.0) < 1e-5
    # tip/tilt dominate the leading KL modes
    V = np.asarray(kl.to_zernike)
    assert np.abs(V[:2, :2]).max() > 0.9
    # round trip
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=14), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(karhunen_loeve.synthesize(
            kl, karhunen_loeve.project(kl, x))),
        np.asarray(x), atol=1e-5)
    assert kl.stack.shape == (14, R, R)


# ----------------- camera chain (shackHartmann.m:480-566 + detector) -------

def test_camera_slopes_match_geometric_at_high_flux():
    """Noise-free, threshold-free camera chain == diffractive centroids,
    and both track geometric slopes for small aberrations."""
    import jax
    from mpc_sensorlessao_tpu.ops import phase_screens
    from mpc_sensorlessao_tpu.utils.config import (AtmosphereConfig,
                                                   TelescopeConfig)
    atm = AtmosphereConfig(fractional_r0=(1.0,), altitudes=(0.0,),
                           wind_speeds=(5.0,), wind_directions=(0.0,))
    tel = TelescopeConfig(resolution=80)
    sh = wfs.build(80, n_lenslet=10)
    scr = np.asarray(phase_screens.synthesize_screen(
        3, atm, 80, tel.pixel_pitch))[:80, :80] * 0.3
    ph = jnp.asarray(scr - scr.mean(), dtype=jnp.float32)
    ref = wfs.reference_slopes(sh)
    cam = np.asarray(wfs.camera_slopes(sh, ph, jax.random.PRNGKey(0),
                                       ref_slopes=ref))
    diff = np.asarray(wfs.diffractive_slopes(sh, ph)) - np.asarray(ref)
    np.testing.assert_allclose(cam, diff, atol=1e-6)
    geo = np.asarray(wfs.geometric_slopes(sh, ph))
    err = np.sqrt(np.mean((cam - geo) ** 2))
    assert err < 0.15 * np.sqrt(np.mean(geo ** 2)), err


def test_thresholding_recovers_low_flux_accuracy():
    """Intensity-based thresholding (shackHartmann.m:493-503) reduces the
    photon/readout-noise slope error at low flux (measured ~40%)."""
    import jax
    from mpc_sensorlessao_tpu.models import imaging
    from mpc_sensorlessao_tpu.ops import phase_screens
    from mpc_sensorlessao_tpu.utils.config import (AtmosphereConfig,
                                                   TelescopeConfig)
    atm = AtmosphereConfig(fractional_r0=(1.0,), altitudes=(0.0,),
                           wind_speeds=(5.0,), wind_directions=(0.0,))
    tel = TelescopeConfig(resolution=80)
    sh = wfs.build(80, n_lenslet=10)
    scr = np.asarray(phase_screens.synthesize_screen(
        3, atm, 80, tel.pixel_pitch))[:80, :80] * 0.3
    ph = jnp.asarray(scr - scr.mean(), dtype=jnp.float32)
    geo = np.asarray(wfs.geometric_slopes(sh, ph))
    det = imaging.DetectorConfig(resolution=sh.dft_op.shape[1],
                                 photon_noise=True, read_out_noise=2.0)
    errs = {None: [], (6.0, 0.2): []}
    for thr in errs:
        for k in range(6):
            s = np.asarray(wfs.camera_slopes(
                sh, ph, jax.random.PRNGKey(k), detector=det,
                n_photons=200.0, threshold=thr))
            errs[thr].append(np.sqrt(np.mean((s - geo) ** 2)))
    assert np.mean(errs[(6.0, 0.2)]) < 0.75 * np.mean(errs[None])


def test_quad_cell_sign_and_zero_reference():
    import jax
    sh = wfs.build(80, n_lenslet=10)
    yy, xx = np.meshgrid(np.arange(80), np.arange(80), indexing="ij")
    tilt = jnp.asarray(0.02 * (xx - 40), dtype=jnp.float32)
    ref = wfs.reference_slopes(sh, quad_cell=True)
    # flat wavefront -> zero slopes after reference subtraction
    flat = np.asarray(wfs.camera_slopes(
        sh, jnp.zeros((80, 80), jnp.float32), jax.random.PRNGKey(0),
        quad_cell=True, ref_slopes=ref))
    assert np.abs(flat).max() < 1e-6
    s = np.asarray(wfs.camera_slopes(sh, tilt, jax.random.PRNGKey(0),
                                     quad_cell=True, ref_slopes=ref))
    n = sh.n_valid
    assert s[:n].mean() * np.asarray(
        wfs.geometric_slopes(sh, tilt))[:n].mean() > 0   # same sign
    assert np.abs(s[n:]).max() < 0.2 * np.abs(s[:n]).mean()  # x-tilt only


def test_flat_field_pixel_gains_units():
    """Camera calibration chain (lensletProcessing.m:181,208): a uniform
    pixel gain cancels in the centroid; a flat-field offset biases raw
    frames but is removed when calibrated; slopes_units scales output."""
    import jax
    sh = wfs.build(80, n_lenslet=10)
    yy, xx = np.meshgrid(np.arange(80), np.arange(80), indexing="ij")
    tilt = jnp.asarray(0.02 * (xx - 40), dtype=jnp.float32)
    ref = wfs.reference_slopes(sh)
    key = jax.random.PRNGKey(0)
    base = np.asarray(wfs.camera_slopes(sh, tilt, key, ref_slopes=ref))
    # center-of-mass is scale invariant -> uniform gain is a no-op
    gain = np.asarray(wfs.camera_slopes(sh, tilt, key, ref_slopes=ref,
                                        pixel_gains=3.7))
    np.testing.assert_allclose(gain, base, atol=1e-6)
    # an uncalibrated additive background (emulated by a NEGATIVE
    # flat_field: subtracting -bias adds it) pulls centroids toward 0
    bias = 0.05 * float(np.asarray(wfs.spot_frames(sh, tilt)).max())
    biased = np.asarray(wfs.camera_slopes(sh, tilt, key, ref_slopes=ref,
                                          flat_field=-bias))
    assert np.abs(biased).sum() < np.abs(base).sum()
    # slopes_units is a pure output scale
    u = np.asarray(wfs.camera_slopes(sh, tilt, key, ref_slopes=ref,
                                     slopes_units=2.0))
    np.testing.assert_allclose(u, 2.0 * base, rtol=1e-6, atol=1e-7)
