"""Tests for utils/units.py, ops/segmented.py and the GMT photometry /
band-combination additions to utils/photometry.py."""

import math

import numpy as np
import pytest

from mpc_sensorlessao_tpu.ops import segmented
from mpc_sensorlessao_tpu.utils import photometry, units


# ---------------------------------------------------------------- units

def test_angle_round_trips():
    # 1 arcsec = 4.84813681e-6 rad (constants.m:6)
    assert units.arcsec(1.0) == pytest.approx(4.84813681e-6, rel=1e-8)
    assert units.arcmin(1.0) == pytest.approx(2.908882e-4, rel=1e-6)
    assert units.mas(1000.0) == pytest.approx(units.arcsec(1.0))
    for u in ("radian", "arcmin", "arcsec", "mas", "degree"):
        assert units.to_unit(units.from_unit(1.234, u), u) == pytest.approx(
            1.234, rel=1e-12)


def test_sky_angle_value_class():
    a = units.SkyAngle.of(30.0, "arcsec")
    assert a.arcsec == pytest.approx(30.0)
    assert a.arcmin == pytest.approx(0.5)
    assert a.mas == pytest.approx(30e3)
    b = a + units.SkyAngle.of(30.0, "arcsec")
    assert b.arcmin == pytest.approx(1.0)
    assert "arcsec" in str(a)


def test_heaviside_and_marechal():
    h = units.heaviside(np.array([-1.0, 0.0, 2.0]))
    np.testing.assert_allclose(h, [0.0, 0.5, 1.0])
    # extended Marechal ~ exp(-sigma^2) for small sigma
    lam = 550e-9
    rms_m = 0.3 / (2 * math.pi) * lam        # sigma = 0.3 rad
    s = units.marechal_strehl(rms_m, lam)
    assert s == pytest.approx((1 - 0.3 ** 2 / 2) ** 2, rel=1e-12)
    assert abs(s - math.exp(-0.3 ** 2)) < 5e-3


# ----------------------------------------------------- GMT photometry

def test_gmt_bands_per_m2_convention():
    # gmtPhotometry.m:25 divides the quoted total-through-GMT zero
    # points by the 368 m^2 collecting area.
    v = photometry.GMT_BANDS["V"]
    assert v.zero_point == pytest.approx(3.3e12 / 368.0)
    assert v.wavelength == pytest.approx(0.550e-6)
    # mag-0 flux through the full aperture recovers the quoted total
    assert v.zero_point * 368.0 == pytest.approx(3.3e12)


def test_band_combine():
    a = photometry.band("V")
    b = photometry.band("R")
    c = photometry.combine(a, b)
    assert c.zero_point == pytest.approx(a.zero_point + b.zero_point)
    assert c.bandwidth == pytest.approx(a.bandwidth + b.bandwidth)
    assert a.wavelength < c.wavelength < b.wavelength or \
        b.wavelength < c.wavelength < a.wavelength


# -------------------------------------------------------- segmented

def test_hexagonal_array_layout():
    for n_cycle in (1, 2, 3):
        centers, vertices = segmented.hexagonal_array(n_cycle, pitch=1.0)
        n_seg = 3 * n_cycle ** 2 + 3 * n_cycle + 1
        assert centers.shape == (n_seg,)
        assert vertices.shape == (n_seg, 6)
        assert centers[0] == 0.0
        # nearest-neighbour spacing of a hex lattice = pitch
        d = np.abs(centers[None, :] - centers[:, None])
        d[d == 0] = np.inf
        assert d.min() == pytest.approx(1.0, rel=1e-12)
        # all centers distinct
        assert np.isinf(d.min(axis=0)).sum() == 0
        # vertices are centered on their segment (mean of hexagon = center)
        np.testing.assert_allclose(vertices.mean(axis=1), centers,
                                   atol=1e-12)


def test_hex_mask_area():
    R = 512
    side = 1.0
    m = segmented.hex_mask(side, R, span=4.0)
    # hexagon area = 3 sqrt(3)/2 side^2 for circumradius=side
    area = m.sum() * (4.0 / R) ** 2
    assert area == pytest.approx(1.5 * math.sqrt(3.0), rel=2e-2)


def test_ptt_basis_modes():
    modes, centers, union = segmented.ptt_basis(1, 256)
    assert modes.shape == (21, 256, 256)        # 7 segments x 3 modes
    # piston modes are disjoint (no overlapping segments)
    pistons = modes[0::3]
    assert (pistons.sum(axis=0) <= 1.0 + 1e-12).all()
    # each segment covers equal area (within rasterization)
    areas = pistons.sum(axis=(1, 2))
    assert areas.min() > 0
    assert areas.std() / areas.mean() < 0.02
    # tip/tilt are zero-mean over their segment and unit P2V across the
    # flat width: range(2 (x-xc)) over |x-xc| <= sqrt(3)/2 side = pitch/2
    for k in range(7):
        p, tip, tilt = modes[3 * k: 3 * k + 3]
        w = p.sum()
        assert abs((tip * p).sum() / w) < 1e-2
        assert abs((tilt * p).sum() / w) < 1e-2
        assert tip.max() - tip.min() == pytest.approx(2.0, rel=0.05)
    # union mask == sum of pistons
    np.testing.assert_allclose(union, pistons.sum(axis=0), atol=1e-12)
    # valid-segment masking drops triples
    sub, _, _ = segmented.ptt_basis(1, 128,
                                    valid=np.array([1, 0, 1, 0, 1, 0, 1],
                                                   dtype=bool))
    assert sub.shape[0] == 12
