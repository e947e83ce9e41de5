"""Von Karman statistics against scipy-based oracle formulas."""

import math

import numpy as np
import pytest
import scipy.special as sps

from mpc_sensorlessao_tpu.ops import phase_stats
from mpc_sensorlessao_tpu.utils.config import AtmosphereConfig

ATM = AtmosphereConfig()


def _oracle_cov(rho, atm):
    L0r0 = (atm.L0 / atm.r0) ** (5 / 3)
    c24 = (24 * math.gamma(6 / 5) / 5) ** (5 / 6)
    cst = c24 * math.gamma(11 / 6) / (2 ** (5 / 6) * math.pi ** (8 / 3)) * L0r0
    var = c24 * math.gamma(11 / 6) * math.gamma(5 / 6) / (
        2 * math.pi ** (8 / 3)) * L0r0
    u = 2 * np.pi * np.asarray(rho) / atm.L0
    out = np.where(u > 0, cst * u ** (5 / 6) * sps.kv(5 / 6, np.where(u > 0, u, 1)),
                   var)
    return out * sum(atm.fractional_r0)


def test_variance_positive_and_consistent_with_cov_at_zero():
    var = phase_stats.variance(ATM)
    assert var > 0
    np.testing.assert_allclose(phase_stats.covariance(0.0, ATM), var,
                               rtol=1e-12)


def test_covariance_against_oracle():
    rho = np.geomspace(1e-3, 50.0, 200)
    ours = phase_stats.covariance(rho, ATM)
    ref = _oracle_cov(rho, ATM)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_covariance_monotone_decreasing():
    rho = np.linspace(0.0, 10.0, 100)
    cov = phase_stats.covariance(rho, ATM)
    assert np.all(np.diff(cov) <= 1e-12)


def test_spectrum_von_karman_form():
    f = np.geomspace(1e-3, 100, 50)
    w = phase_stats.spectrum(f, ATM)
    # high-frequency slope -> -11/3 (Kolmogorov)
    slope = np.diff(np.log(w[-10:])) / np.diff(np.log(f[-10:]))
    np.testing.assert_allclose(slope, -11 / 3, rtol=1e-3)
    # variance = integral of PSD over the 2D frequency plane
    f2 = np.geomspace(1e-6, 1e4, 4000)
    integrand = phase_stats.spectrum(f2, ATM) * 2 * np.pi * f2
    var_num = np.trapezoid(integrand, f2)
    np.testing.assert_allclose(var_num, phase_stats.variance(ATM), rtol=1e-3)


def test_covariance_matrix_symmetry():
    pts = np.array([0 + 0j, 0.1 + 0j, 0 + 0.25j, 0.3 + 0.4j])
    C = phase_stats.covariance_matrix(pts, pts, ATM)
    np.testing.assert_allclose(C, C.T, rtol=1e-12)
    eig = np.linalg.eigvalsh(C)
    assert np.all(eig > -1e-9)


# ----------------------------- angular/temporal statistics + observables

def test_angular_temporal_covariance_reduce_to_static():
    """theta=0 / tau=0 recover the full phase variance
    (phaseStats.m:62-124: per-layer covariance at rho=0 sums to var)."""
    np.testing.assert_allclose(
        phase_stats.angular_covariance(0.0, ATM),
        phase_stats.variance(ATM), rtol=1e-12)
    np.testing.assert_allclose(
        phase_stats.temporal_covariance(0.0, ATM),
        phase_stats.variance(ATM), rtol=1e-12)
    np.testing.assert_allclose(
        phase_stats.angular_structure_function(0.0, ATM), 0.0, atol=1e-12)


def test_angular_structure_function_monotone():
    th = np.linspace(0.0, 50e-6, 8)
    sf = phase_stats.angular_structure_function(th, ATM)
    assert np.all(np.diff(sf) > 0)


def test_seeing():
    assert ATM.seeing_arcsec == (
        pytest.approx(180 / math.pi * 3600 * 0.98 * ATM.wavelength / ATM.r0))


def test_theta0_kolmogorov_closed_form():
    """Kolmogorov closed form (atmosphere.m:326-328)."""
    import dataclasses
    atm = dataclasses.replace(ATM, L0=math.inf)
    cst = (1.0 * (24 * math.gamma(6 / 5) / 5) ** (-5 / 6)
           * atm.r0 ** (5 / 3))
    s = sum(f * h ** (5 / 3)
            for f, h in zip(atm.fractional_r0, atm.altitudes))
    expect = (cst / s) ** (3 / 5) * 180 / math.pi * 3600
    assert atm.theta0_arcsec == pytest.approx(expect)


def test_theta0_von_karman_satisfies_decay_condition():
    """Root definition: angular SF(theta0) = -2 ln(decay) = 2 (Roddier)
    (atmosphere.m:329-331)."""
    th0 = ATM.theta0_arcsec / (180 / math.pi * 3600)
    sf = float(phase_stats.angular_structure_function(th0, ATM))
    assert sf == pytest.approx(2.0, rel=1e-6)
    # finite outer scale decorrelates slower than Kolmogorov at large
    # separations -> theta0(VK) >= theta0(Kolmogorov)
    import dataclasses
    assert ATM.theta0_arcsec > dataclasses.replace(
        ATM, L0=math.inf).theta0_arcsec


def test_tau0_von_karman_satisfies_decay_condition():
    t0 = ATM.tau0_ms * 1e-3
    sf = float(phase_stats.temporal_structure_function(t0, ATM))
    assert sf == pytest.approx(2.0, rel=1e-6)


def test_greenwood_frequency():
    mw = sum(f * v ** (5 / 3) for f, v in
             zip(ATM.fractional_r0, ATM.wind_speeds)) ** (3 / 5)
    assert ATM.greenwood_frequency == pytest.approx(0.4292 * mw / ATM.r0)
    assert phase_stats.mean_wind(ATM) == pytest.approx(mw)
