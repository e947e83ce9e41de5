"""Zernike-coefficient statistics of Von Karman turbulence.

Equivalent capability to the reference's (bundled, unused) `zernikeStats`
analytics (OOMAO-master/zernikeStats.m): covariance and variance of the
Zernike coefficients of atmospheric phase over the telescope aperture.

Method: direct covariance propagation through the least-squares fit
operator on the sampling grid --  cov(a) = W C_phi W'  with
W = pinv(Z_in) the decomposition operator (exactly the one the pipeline
uses, so conventions/normalization match by construction) and C_phi the
Von Karman phase covariance between pupil sample points
(phase_stats.covariance_matrix).  Exact w.r.t. the framework's discrete
basis; resolution-limited (use >= 32 px).  Also provides the
piston-removed variant matching stochasticWave.meanRmPhase semantics.

Host-side (setup/validation tool); float64.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..utils.config import AtmosphereConfig
from . import phase_stats, zernike


@lru_cache(maxsize=8)
def _fit_geometry(radial_order: int, resolution: int):
    r, theta, mask = zernike._grid_polar(resolution)
    z_in = zernike.eval_points(radial_order, r[mask], theta[mask])
    w = np.linalg.pinv(z_in)                       # (K, P)
    return r, theta, mask, w


def coefficient_covariance(
    atm: AtmosphereConfig,
    diameter: float,
    radial_order: int,
    resolution: int = 48,
    piston_removed: bool = True,
) -> np.ndarray:
    """(K, K) covariance of fitted Zernike coefficients [rad^2].

    ``piston_removed`` applies the mean-removal projector inside the
    aperture before the fit (the pipeline's meanRmPhase convention).
    """
    r, theta, mask, w = _fit_geometry(radial_order, resolution)
    R = resolution
    N1 = R - 1
    xs = (np.arange(R) * 2.0 - N1) / N1 * (diameter / 2.0)
    X, Y = np.meshgrid(xs, xs)
    pts = (X + 1j * Y)[mask]
    C = phase_stats.covariance_matrix(pts, pts, atm)
    if piston_removed:
        P = pts.shape[0]
        J = np.full((P, P), 1.0 / P)
        M = np.eye(P) - J
        C = M @ C @ M.T
    return w @ C @ w.T


def coefficient_variances(atm, diameter, radial_order,
                          resolution: int = 48,
                          piston_removed: bool = True) -> np.ndarray:
    """Per-mode variances (the diagonal), in the framework's modified
    mode ordering."""
    return np.diag(coefficient_covariance(
        atm, diameter, radial_order, resolution, piston_removed)).copy()


def total_residual_variance(atm, diameter, radial_order,
                            resolution: int = 48) -> float:
    """Piston-removed phase variance NOT captured by the first K modes
    (the fitting-error floor for a modal corrector)."""
    r, theta, mask, w = _fit_geometry(radial_order, resolution)
    R = resolution
    N1 = R - 1
    xs = (np.arange(R) * 2.0 - N1) / N1 * (diameter / 2.0)
    X, Y = np.meshgrid(xs, xs)
    pts = (X + 1j * Y)[mask]
    C = phase_stats.covariance_matrix(pts, pts, atm)
    P = pts.shape[0]
    J = np.full((P, P), 1.0 / P)
    M = np.eye(P) - J
    C = M @ C @ M.T
    z_in = zernike.eval_points(radial_order, r[mask], theta[mask])
    proj = z_in @ w                                # (P, P) fit projector
    resid = C - proj @ C - C @ proj.T + proj @ C @ proj.T
    return float(np.trace(resid) / P)
