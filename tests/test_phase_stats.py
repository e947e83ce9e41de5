"""Von Karman statistics against scipy-based oracle formulas."""

import math

import numpy as np
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
