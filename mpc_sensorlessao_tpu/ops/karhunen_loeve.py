"""Karhunen-Loeve modes of Von Karman turbulence.

Equivalent capability to the reference's bundled `karhunenLoeve.m`
(OOMAO-master, 145 LoC, unused by the pipeline -- SURVEY.md 2d): the
statistically optimal modal basis, obtained here by diagonalizing the
*analytic* Zernike-coefficient covariance (ops/zernike_stats.py) rather
than OOMAO's numerical double-integral route.  KL mode k is the
coefficient-space eigenvector v_k mapped through the Zernike stack; the
eigenvalues are the per-mode variances, sorted descending, and the modes
are statistically independent by construction.

Host-side float64 setup tool (basis construction); the resulting
projection/synthesis operators are plain matmuls like the Zernike ones.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..utils.config import AtmosphereConfig
from . import zernike, zernike_stats


class KLBasis(NamedTuple):
    """KL basis over the first K Zernike modes (piston excluded).

    to_zernike:  (K, K) columns = KL modes in Zernike coefficients
                 (x_zern = to_zernike @ x_kl).
    variances:   (K,) KL mode variances [rad^2], descending.
    stack:       (K, R, R) KL mode maps (if built with a grid basis).
    """

    to_zernike: jnp.ndarray
    variances: jnp.ndarray
    stack: jnp.ndarray | None


def make_basis(atm: AtmosphereConfig, diameter: float, radial_order: int,
               grid_basis: zernike.ZernikeBasis | None = None,
               resolution: int = 48, dtype=jnp.float32) -> KLBasis:
    """KL modes from the analytic coefficient covariance.

    ``grid_basis``: optional Zernike grid stack to materialize KL mode
    maps (stack[k] = sum_j to_zernike[j, k] Z_{j+1}).
    """
    C = zernike_stats.coefficient_covariance(
        atm, diameter, radial_order, resolution=resolution)[1:, 1:]
    w, V = np.linalg.eigh(C)
    order = np.argsort(w)[::-1]
    w, V = w[order], V[:, order]
    stack = None
    if grid_basis is not None:
        zs = np.asarray(grid_basis.stack[1:], dtype=np.float64)
        K, R, _ = zs.shape
        stack = jnp.asarray(
            np.einsum("jk,jxy->kxy", V, zs), dtype=dtype)
    return KLBasis(
        to_zernike=jnp.asarray(V, dtype=dtype),
        variances=jnp.asarray(np.clip(w, 0.0, None), dtype=dtype),
        stack=stack,
    )


def project(basis: KLBasis, zern_coeffs: jnp.ndarray) -> jnp.ndarray:
    """Zernike coefficients -> KL coefficients (orthonormal V: V')."""
    return zern_coeffs @ basis.to_zernike


def synthesize(basis: KLBasis, kl_coeffs: jnp.ndarray) -> jnp.ndarray:
    """KL coefficients -> Zernike coefficients."""
    return kl_coeffs @ basis.to_zernike.T
