"""Pyramid WFS (pyramid.m) — DFT-as-matmul Fourier filtering sensor."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpc_sensorlessao_tpu.models import pyramid
from mpc_sensorlessao_tpu.ops import zernike

R, NL = 32, 8


@pytest.fixture(scope="module")
def model():
    return pyramid.build(R, NL, modulation=3.0)


@pytest.fixture(scope="module")
def basis():
    return zernike.make_basis(radial_order=3, resolution=R)


def test_build_shapes(model):
    assert model.px_side == 2 * 2 * R
    assert model.phasors.shape[0] == round(2 * np.pi * 2 * 3.0)
    assert model.n_slopes == 2 * model.n_valid
    img = pyramid.intensity_map(model, jnp.zeros((R, R)))
    assert img.shape == (2 * 2 * NL, 2 * 2 * NL)
    # four pupil images, one per quadrant, roughly equal flux for flat
    h = 2 * NL
    fluxes = [float(img[:h, :h].sum()), float(img[h:, :h].sum()),
              float(img[h:, h:].sum()), float(img[:h, h:].sum())]
    assert max(fluxes) < 1.3 * min(fluxes)


def test_flat_wavefront_zero_slopes(model):
    s = pyramid.slopes(model, jnp.zeros((R, R)))
    assert float(jnp.max(jnp.abs(s))) < 1e-6


def test_tilt_response_sign_and_linearity(model, basis):
    """Small y-tilt drives the Sy quadrant difference linearly."""
    tilt = basis.stack[1]                     # (1,-1) mode ~ y-tilt
    s1 = pyramid.slopes(model, 0.05 * tilt)
    s2 = pyramid.slopes(model, 0.10 * tilt)
    nv = model.n_valid
    m1 = float(jnp.mean(s1[nv:]))
    m2 = float(jnp.mean(s2[nv:]))
    assert abs(m1) > 1e-5                     # responds in sy
    assert m2 / m1 == pytest.approx(2.0, rel=0.15)
    # x-slopes stay comparatively quiet
    assert abs(float(jnp.mean(s1[:nv]))) < 0.2 * abs(m1)


def test_gain_calibration_unity(model, basis):
    cal = pyramid.gain_calibration(model, basis.stack[1])
    a = 0.08
    s = pyramid.slopes(cal, jnp.float32(a) * basis.stack[1])
    assert float(jnp.mean(s[model.n_valid:])) == pytest.approx(4 * a,
                                                               rel=0.1)


def test_modulation_extends_linear_range(basis):
    """Unmodulated pyramid saturates sooner than a modulated one
    (the defining pyramid trade-off)."""
    tilt = basis.stack[1]
    m0 = pyramid.build(R, NL, modulation=0.0)
    m3 = pyramid.build(R, NL, modulation=3.0)

    def growth(model):
        """Response growth from 1 to 8 rad tilt: ~1 = saturated."""
        nv = model.n_valid
        lo = float(jnp.mean(pyramid.slopes(model, 1.0 * tilt)[nv:]))
        hi = float(jnp.mean(pyramid.slopes(model, 8.0 * tilt)[nv:]))
        return hi / lo

    assert growth(m0) < 2.0       # unmodulated saturates early
    assert growth(m3) > 5.0       # modulated keeps responding
    # and the small-signal gain trade-off: modulation lowers the gain
    g0 = float(jnp.mean(pyramid.slopes(m0, 0.05 * tilt)[m0.n_valid:]))
    g3 = float(jnp.mean(pyramid.slopes(m3, 0.05 * tilt)[m3.n_valid:]))
    assert abs(g3) < abs(g0)


def test_modal_reconstruction(model, basis):
    """Poke-matrix calibration closes: recover a small aberration."""
    modes = basis.stack[1:]                   # drop piston
    D = pyramid.interaction_matrix(model, modes, amplitude=0.05)
    rng = np.random.default_rng(0)
    a = (rng.normal(size=modes.shape[0]) * 0.02).astype(np.float32)
    phase = jnp.einsum("k,kij->ij", jnp.asarray(a), modes)
    s = pyramid.slopes(model, phase)
    rec = np.linalg.pinv(np.asarray(D, np.float64)) @ np.asarray(s)
    np.testing.assert_allclose(rec, a, atol=5e-3)
