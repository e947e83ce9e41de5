"""Laser guide star: Na profile weights + spot elongation
(laserGuideStar.m)."""

import numpy as np
import jax
import jax.numpy as jnp

from mpc_sensorlessao_tpu.models import lgs, wfs


def test_na_profile_weights_and_angular_size():
    h = 1e3 * (np.arange(-5, 6) + 90.0)
    m = lgs.build(h)                       # flat profile
    w = np.asarray(m.weights)
    assert abs(w.sum() - 1.0) < 1e-6
    # flat profile: weights follow 1/h^2 (laserGuideStar.m:59)
    r = w * np.asarray(h) ** 2
    assert np.allclose(r, r[0], rtol=1e-5)
    # peaked profile shifts the weight to the peak slab
    rho = np.zeros(11); rho[3] = 1.0
    m2 = lgs.build(h, na_density=rho)
    assert np.asarray(m2.weights)[3] > 0.999
    # the reference example: 25 m telescope, 90 km, +/-5 km slabs
    size = lgs.angular_size_arcsec(25.0, h, 90e3)
    assert 6.0 < size < 7.0               # 25*10e3/90e3^2 rad = 6.37"


def test_elongation_zero_on_axis_and_radial():
    h = 1e3 * (np.arange(-5, 6) + 90.0)
    m = lgs.build(h, launch=(0.0, 0.0))
    pos = np.array([[0.0, 0.0], [2.0, 0.0], [0.0, 2.0]])
    off = np.asarray(lgs.elongation_offsets(m, pos))
    assert np.abs(off[0]).max() < 1e-12          # launch axis: no elong.
    # radial: x-offset subap elongates along x only, scale ~ r dh / h^2
    assert np.abs(off[1, :, 1]).max() < 1e-12
    span = off[1, :, 0].max() - off[1, :, 0].min()
    assert abs(span - 2.0 * 10e3 / 90e3 ** 2) < 0.05 * span
    assert np.abs(off[2, :, 0]).max() < 1e-12


def test_elongated_spots_flux_and_smearing():
    sh = wfs.build(80, n_lenslet=10)
    phase = jnp.zeros((80, 80), jnp.float32)
    spots = wfs.spot_frames(sh, phase)            # (100, w, w)
    h = 1e3 * (np.arange(-5, 6) + 90.0)
    m = lgs.build(h, launch=(-0.5, 0.0))
    pos = lgs.subaperture_positions(10, 1.0)
    # exaggerated plate scale so the elongation spans several pixels
    ker = lgs.elongation_kernels(m, pos, plate_scale_rad=2e-7, kw=9)
    el = lgs.elongate_spots(spots, ker)
    # flux preserved for interior subapertures (kernels normalized;
    # edge subaps legitimately lose flux past the crop window)
    f0 = np.asarray(jnp.sum(spots, axis=(-2, -1)))
    f1 = np.asarray(jnp.sum(el, axis=(-2, -1)))
    pos_r = np.hypot(*lgs.subaperture_positions(10, 1.0).T)
    interior = pos_r < 0.3
    np.testing.assert_allclose(f1[interior], f0[interior], rtol=5e-2)
    # peak reduced where elongation is strong (far from launch),
    # nearly untouched at the launch-axis subaperture
    peaks0 = np.asarray(jnp.max(spots, axis=(-2, -1)))
    peaks1 = np.asarray(jnp.max(el, axis=(-2, -1)))
    r = np.hypot(pos[:, 0] - (-0.5), pos[:, 1])
    lit = f0 > 0.5 * f0.max()
    near = np.argmin(np.where(lit, r, np.inf))
    far = np.argmax(np.where(lit, r, -np.inf))
    assert peaks1[far] < 0.75 * peaks0[far]
    assert peaks1[near] > 0.9 * peaks0[near]
