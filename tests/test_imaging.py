"""Detector + imager (detector.m, imager.m)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_sensorlessao_tpu.models import imaging
from mpc_sensorlessao_tpu.ops import psf, zernike


def test_binning_preserves_flux():
    img = jnp.asarray(np.random.default_rng(0).random((64, 64)),
                      jnp.float32)
    b = imaging.bin_frame(img, 16)
    assert b.shape == (16, 16)
    assert float(b.sum()) == pytest.approx(float(img.sum()), rel=1e-6)


def test_noiseless_readout_is_identity():
    cfg = imaging.DetectorConfig(resolution=32)
    img = jnp.ones((32, 32)) * 7.0
    out = imaging.read_out(cfg, jax.random.PRNGKey(0), img)
    np.testing.assert_allclose(np.asarray(out), 7.0, rtol=1e-6)


def test_photon_noise_statistics():
    """Poisson: mean = flux, var = flux (detector.m:315-316)."""
    cfg = imaging.DetectorConfig(resolution=64, photon_noise=True)
    img = jnp.full((64, 64), 50.0)
    out = np.asarray(imaging.read_out(cfg, jax.random.PRNGKey(1), img))
    assert out.mean() == pytest.approx(50.0, rel=0.02)
    assert out.var() == pytest.approx(50.0, rel=0.1)


def test_qe_applied_after_photon_noise():
    """QE scales the Poisson draw, so var = QE^2 flux (detector.m:318)."""
    cfg = imaging.DetectorConfig(resolution=64, photon_noise=True,
                                 quantum_efficiency=0.5)
    img = jnp.full((64, 64), 100.0)
    out = np.asarray(imaging.read_out(cfg, jax.random.PRNGKey(2), img))
    assert out.mean() == pytest.approx(50.0, rel=0.02)
    assert out.var() == pytest.approx(25.0, rel=0.1)


def test_read_out_noise_added():
    cfg = imaging.DetectorConfig(resolution=64, read_out_noise=3.0)
    img = jnp.zeros((64, 64))
    out = np.asarray(imaging.read_out(cfg, jax.random.PRNGKey(3), img))
    assert out.std() == pytest.approx(3.0, rel=0.1)


def test_exposure_integration():
    cfg = imaging.DetectorConfig(resolution=8, exposure_frames=5)
    frames = jnp.ones((5, 8, 8))
    out = imaging.expose(cfg, jax.random.PRNGKey(0), frames)
    np.testing.assert_allclose(np.asarray(out), 5.0, rtol=1e-6)


@pytest.fixture(scope="module")
def psf_pair():
    R = 64
    basis = zernike.make_basis(3, R)
    pupil = psf.pupil_mask(R)
    phase = 1.0 * basis.stack[4]
    mask = np.asarray(pupil) > 0
    var = float(np.var(np.asarray(phase)[mask]))
    flat = psf.psf_intensity(jnp.zeros((R, R)), pupil, 1.0)
    aber = psf.psf_intensity(phase, pupil, 1.0)
    return flat, aber, var


def test_strehl_ordering(psf_pair):
    flat, aber, var = psf_pair
    s_dl = float(imaging.strehl_ratio(flat, flat))
    s_ab = float(imaging.strehl_ratio(aber, flat))
    assert s_dl == pytest.approx(1.0, abs=1e-6)
    assert 0.0 < s_ab < 1.0
    # Marechal: S ~ exp(-sigma^2) for the actual pupil phase variance
    assert s_ab == pytest.approx(np.exp(-var), abs=0.1)


def test_encircled_energy(psf_pair):
    flat, aber, _ = psf_pair
    ee_dl = float(imaging.encircled_energy(flat, 8))
    ee_ab = float(imaging.encircled_energy(aber, 8))
    assert 0 < ee_ab < ee_dl <= 1.0


def test_imager_end_to_end(psf_pair):
    flat, aber, _ = psf_pair
    cfg = imaging.DetectorConfig(resolution=32, photon_noise=True)
    res = imaging.imager(cfg, jax.random.PRNGKey(4),
                         1e5 * aber[None], 1e5 * flat, ee_width=4)
    assert res.frame.shape == (32, 32)
    assert 0 < float(res.strehl) < 1.0
    assert 0 < float(res.ee) <= 1.0


# ---------------------------------------------- image-domain utilities

def test_gaussian_frame_unit_flux_and_crop():
    f = imaging.gaussian_frame(64, fwhm=6.0)
    assert f.shape == (64, 64)
    assert float(jnp.sum(f)) == pytest.approx(1.0, rel=1e-5)
    # peak at the reference's grid center (n/2)
    ij = np.unravel_index(int(jnp.argmax(f)), f.shape)
    assert ij == (32, 32)
    fc = imaging.gaussian_frame(64, fwhm=6.0, n_f=16)
    assert fc.shape == (32, 32)
    # crop keeps the center untouched (utilities.m:761-768)
    np.testing.assert_allclose(np.asarray(fc),
                               np.asarray(f[16:48, 16:48]))


def test_barycenter_known_blob():
    n = 33
    u = np.arange(n, dtype=np.float64)
    x, y = np.meshgrid(u, u)
    blob = np.exp(-((x - 20.0) ** 2 + (y - 12.0) ** 2) / 8.0)
    xb, yb = imaging.barycenter(jnp.asarray(x), jnp.asarray(y),
                                jnp.asarray(blob))
    assert float(xb[0]) == pytest.approx(20.0, abs=1e-3)
    assert float(yb[0]) == pytest.approx(12.0, abs=1e-3)


def test_fit_fwhm_gaussian():
    # for a Gaussian, the half-max contour radius is fwhm/2
    fwhm = 9.0
    f = imaging.gaussian_frame(64, fwhm=fwhm)
    rc = float(imaging.fit_fwhm(f))
    assert rc == pytest.approx(fwhm / 2.0, rel=0.05)


def test_fit_fwhm_elongated_gaussian():
    # gradient-adaptive subpixel band (ADVICE r4): for an elliptical
    # Gaussian the half-max contour has semiaxes (fa/2, fb/2), so the
    # area-equivalent radius is sqrt(fa*fb)/2 regardless of elongation
    fa, fb = 12.0, 5.0
    u = np.arange(64, dtype=np.float64) - 32.0
    x, y = np.meshgrid(u, u)
    sa = fa / (2.0 * np.sqrt(2.0 * np.log(2.0)))
    sb = fb / (2.0 * np.sqrt(2.0 * np.log(2.0)))
    f = np.exp(-(x / sa) ** 2 / 2.0 - (y / sb) ** 2 / 2.0)
    rc = float(imaging.fit_fwhm(jnp.asarray(f)))
    assert rc == pytest.approx(np.sqrt(fa * fb) / 2.0, rel=0.05)


def test_fit_fwhm_sharp_peak():
    # a near-delta peak (steep gradients) must not blow up the adaptive
    # ramp: area stays close to the hard-threshold count
    f = np.full((32, 32), 1e-3)
    f[16, 16] = 1.0
    f[16, 15] = f[16, 17] = f[15, 16] = f[17, 16] = 0.6
    rc = float(imaging.fit_fwhm(jnp.asarray(f)))
    assert 0.5 < rc < 2.5


def test_gerchberg_saxton_recovers_psf():
    # forward: pupil + known smooth phase -> focal intensity; GS must
    # find a phase whose focal intensity matches the target closely
    n = 32
    pup = np.asarray(psf.pupil_mask_np(n), np.float64)
    basis = zernike.make_basis(2, n)
    true_phase = 0.8 * np.asarray(basis.stack[3], np.float64)
    P = pup * np.exp(1j * true_phase)
    fsh = np.fft.fftshift
    focal = np.abs(fsh(np.fft.fft2(fsh(P)))) ** 2
    phase, cvg = imaging.gerchberg_saxton(pup, focal, n_iterations=200,
                                          seed=1)
    assert cvg[-1] < 0.05 * cvg[0]  # converged
    Pr = pup * np.exp(1j * phase)
    rec = np.abs(fsh(np.fft.fft2(fsh(Pr)))) ** 2
    rel = np.linalg.norm(rec - focal) / np.linalg.norm(focal)
    assert rel < 0.05
