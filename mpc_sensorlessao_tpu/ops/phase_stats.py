"""Von Karman phase statistics.

TPU-native equivalent of the reference's `phaseStats` static class
(reference: OOMAO-master/phaseStats.m:6-39,194-209).  The PSD is
jnp-friendly (used inside jitted screen synthesis); covariance/variance use
the from-scratch K_{5/6} in utils.special and run either on host (numpy,
float64 -- used for setup-time covariance matrices) or on device.
"""

from __future__ import annotations

import math

import numpy as np

from ..utils.config import AtmosphereConfig
from ..utils.special import kv_frac

# (24 Gamma(6/5) / 5)^(5/6) appears in every constant (phaseStats.m:14,30,203)
_C24 = (24.0 * math.gamma(6.0 / 5.0) / 5.0) ** (5.0 / 6.0)
_VAR_CST = _C24 * math.gamma(11.0 / 6.0) * math.gamma(5.0 / 6.0) / (
    2.0 * math.pi ** (8.0 / 3.0))
_COV_CST = _C24 * math.gamma(11.0 / 6.0) / (
    2.0 ** (5.0 / 6.0) * math.pi ** (8.0 / 3.0))
_PSD_CST = _C24 * math.gamma(11.0 / 6.0) ** 2 / (2.0 * math.pi ** (11.0 / 3.0))


def _frac_sum(atm: AtmosphereConfig) -> float:
    return float(sum(atm.fractional_r0))


def variance(atm: AtmosphereConfig) -> float:
    """Phase variance [rad^2] (phaseStats.m:6-18)."""
    return _VAR_CST * (atm.L0 / atm.r0) ** (5.0 / 3.0) * _frac_sum(atm)


def covariance(rho, atm: AtmosphereConfig, xp=np):
    """Phase covariance at separation rho [m] (phaseStats.m:20-39)."""
    rho = xp.asarray(rho)
    L0r0 = (atm.L0 / atm.r0) ** (5.0 / 3.0)
    var = _VAR_CST * L0r0
    u = 2.0 * math.pi * rho / atm.L0
    safe_u = xp.where(u > 0, u, xp.ones_like(u))
    cov = _COV_CST * L0r0 * safe_u ** (5.0 / 6.0) * kv_frac(5.0 / 6.0, safe_u, xp)
    out = xp.where(u > 0, cov, var)
    return out * _frac_sum(atm)


def structure_function(rho, atm: AtmosphereConfig, xp=np):
    """D_phi(rho) = 2 (var - cov) (phaseStats.m:186-190)."""
    return 2.0 * (variance(atm) - covariance(rho, atm, xp))


def spectrum(f, atm: AtmosphereConfig, xp=np):
    """Phase PSD at spatial frequency f [1/m] (phaseStats.m:194-209).

    W(f) = cst r0^{-5/3} (f^2 + 1/L0^2)^{-11/6}, scaled by the layer
    fractional-r0 sum.  Works on numpy or jax.numpy arrays.
    """
    f = xp.asarray(f)
    out = _PSD_CST * atm.r0 ** (-5.0 / 3.0) * (
        f * f + 1.0 / atm.L0 ** 2) ** (-11.0 / 6.0)
    return out * _frac_sum(atm)


def covariance_matrix(points1: np.ndarray, points2: np.ndarray,
                      atm: AtmosphereConfig) -> np.ndarray:
    """Dense covariance between two complex-coded point sets [m].

    Host float64 equivalent of phaseStats.covarianceMatrix
    (phaseStats.m:305-371); used at setup time for the conditional-Gaussian
    screen-extension operators (telescopeAbstract.m:854-884).
    """
    p1 = np.asarray(points1, dtype=np.complex128).ravel()
    p2 = np.asarray(points2, dtype=np.complex128).ravel()
    rho = np.abs(p1[:, None] - p2[None, :])
    return covariance(rho, atm, np)
