"""Modal atmospheric tomography: multi-guide-star linear MMSE.

Equivalent capability to the reference's `linearMMSE.m` (797 LoC,
bundled OOMAO; 'modal' branch, linearMMSE.m:215-241) completing the
linearMMSE surface beyond the single-star gains in models/wfs.py and
models/estimator.py: estimate the Zernike coefficients of the phase in
a SCIENCE direction from coefficients measured in several GUIDE-STAR
directions,

    x_sci_hat = M x_gs,    M = Cox (Cxx + Cn)^-1,

with every covariance block the ANALYTIC frozen-flow Zernike angular
covariance (ops/zernike_stats.coefficient_angular_covariance -- the
zernikeStats.angularCovariance machinery the reference builds these
from), including an optional temporal prediction lag (linearMMSE.m
lag/CoxLag semantics: the science covariance is taken ``lag`` seconds
AHEAD of the guide-star measurements, so M predicts).

The tomographic error covariance and its Strehl come for free:
    Cerr = Coo - Cox (Cxx + Cn)^-1 Cox'
    strehl ~= exp(-trace(Cerr_normalized))   (Marechal;
              linearMMSE.m:346-352 get.strehlRatio).

Host float64 build (one-off); the gain is a device matmul, batched with
vmap like every other estimator here.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

from ..ops import zernike_stats
from ..utils.config import AtmosphereConfig


class ModalTomography(NamedTuple):
    """Precomputed tomographic reconstructor.

    gain:      (K, n_gs*K) MMSE gain (device);
    err_cov:   (K, K) posterior error covariance (host, framework
               normalization);
    err_var_rad2: scalar phase-variance of the tomographic error
               (normalized-basis trace -- aperture rad^2);
    strehl_marechal: exp(-err_var).
    """

    gain: jnp.ndarray
    err_cov: np.ndarray
    err_var_rad2: float
    strehl_marechal: float

    @property
    def n_modes(self) -> int:
        return self.gain.shape[0]

    @property
    def n_guide_stars(self) -> int:
        return self.gain.shape[1] // self.gain.shape[0]


def build(atm: AtmosphereConfig, diameter: float, radial_order: int,
          gs_directions: Sequence[tuple[float, float]],
          science_direction: tuple[float, float] = (0.0, 0.0),
          noise_cov: float | np.ndarray = 0.0,
          lag: float = 0.0) -> ModalTomography:
    """Assemble Cxx/Cox/Coo and solve the MMSE gain.

    gs_directions: per guide star (theta_x, theta_y) [rad];
    noise_cov: per-GS coefficient measurement noise -- scalar variance,
    (K,) diagonal, or (K, K) block (replicated across guide stars);
    lag: prediction horizon [s] (frozen flow carries the covariance).
    """
    dirs = [np.asarray(d, dtype=np.float64) for d in gs_directions]
    sci = np.asarray(science_direction, dtype=np.float64)
    n_gs = len(dirs)
    K1 = zernike_stats._mode_nm(radial_order)[0].shape[0]

    def cov(dth, tau=0.0):
        return zernike_stats.coefficient_angular_covariance(
            atm, diameter, radial_order, tuple(dth), lag=tau)

    # piston excluded everywhere (the pipeline's state convention)
    sl = slice(1, K1)
    Cxx = np.zeros((n_gs * (K1 - 1),) * 2)
    for i in range(n_gs):
        for j in range(i, n_gs):
            # C[i,j] = <a(dir_i) a(dir_j)'> -- depends on dir_i - dir_j
            blk = cov(dirs[i] - dirs[j])[sl, sl]
            Cxx[i * (K1 - 1):(i + 1) * (K1 - 1),
                j * (K1 - 1):(j + 1) * (K1 - 1)] = blk
            if j > i:
                Cxx[j * (K1 - 1):(j + 1) * (K1 - 1),
                    i * (K1 - 1):(i + 1) * (K1 - 1)] = blk.T
    Cox = np.hstack([cov(sci - d, tau=lag)[sl, sl] for d in dirs])
    Coo = cov((0.0, 0.0))[sl, sl]

    Cn = np.asarray(noise_cov, dtype=np.float64)
    if Cn.ndim == 0:
        Cn = Cn * np.eye(K1 - 1)
    elif Cn.ndim == 1:
        Cn = np.diag(Cn)
    Cxx_n = Cxx + np.kron(np.eye(n_gs), Cn)
    # tiny ridge: Cxx is near-singular when guide stars nearly coincide
    Cxx_n = Cxx_n + 1e-10 * np.trace(Cxx_n) / Cxx_n.shape[0] * np.eye(
        Cxx_n.shape[0])
    M = np.linalg.solve(Cxx_n, Cox.T).T
    Cerr = Coo - M @ Cox.T

    # aperture phase variance of the error: convert the framework-
    # normalized covariance diagonal to Noll (rms-1) modes
    Nf = zernike_stats.norm_factors(radial_order)[sl]
    err_var = float(np.sum(np.diag(Cerr) / Nf ** 2))
    return ModalTomography(
        gain=jnp.asarray(M, dtype=jnp.float32),
        err_cov=Cerr,
        err_var_rad2=err_var,
        strehl_marechal=float(np.exp(-max(err_var, 0.0))),
    )


def estimate(model: ModalTomography, gs_coeffs: jnp.ndarray) -> jnp.ndarray:
    """(..., n_gs, K) guide-star coefficients -> (..., K) science-
    direction estimate (one matmul; vmap over batches)."""
    flat = gs_coeffs.reshape(*gs_coeffs.shape[:-2], -1)
    return flat @ model.gain.T
