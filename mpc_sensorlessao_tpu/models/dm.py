"""Deformable-mirror model: Gaussian influence functions, modal influence
matrix, and rad<->Volt conversion.

Re-derivation of the reference's DM section (reference: README.md:193-271):
a 12x12 actuator grid with Gaussian influence functions
I_j = exp(ln(c) ((x-x0)^2+(y-y0)^2)/d^2), sampled on the DM grid, cropped to
the pupil plane and projected onto the Zernike stack with
B = pinv(Zs' Zs) Zs' B_pupil  (README.md:271).  Everything is built once on
host in float64 (setup-time), shipped to device as the (nx, n_act) modal
influence matrix with the piston row deleted (README.md:290).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops import zernike
from ..utils.config import DMConfig


class DMModel(NamedTuple):
    influence: jnp.ndarray      # (nx, n_act) modal influence matrix B (no piston)
    influence_full: jnp.ndarray  # (n_modes, n_act) including piston row
    coeff_a: float
    coeff_b: float

    @property
    def n_actuators(self) -> int:
        return self.influence.shape[1]


def _dm_grid_axes(cfg: DMConfig, pixel_pitch: float):
    """DM-plane axes and actuator center indices (README.md:206-219)."""
    len_dm = int(round(cfg.half_width * 2 / pixel_pitch))
    xaxis = (np.arange(len_dm) - len_dm / 2) * pixel_pitch
    m1 = cfg.n_act_side
    diff = len_dm // (m1 - 1)
    idx = np.array([0] + [i * diff for i in range(1, m1)])
    idx[-1] = len_dm - 1
    centers = xaxis[idx]
    return len_dm, xaxis, centers


def influence_maps_pupil(
    cfg: DMConfig, resolution: int, pixel_pitch: float
) -> np.ndarray:
    """Per-actuator Gaussian bumps cropped to the pupil grid.

    Returns (n_act, R, R) float64.  Mirrors README.md:222-263: bumps built
    on the DM grid then cropped to the central pupil window; actuator index
    runs row-major over (i=y, j=x) like the MATLAB double loop (act_idx
    increments with j fastest, README.md:224-234).
    """
    len_dm, xaxis_dm, centers = _dm_grid_axes(cfg, pixel_pitch)
    yaxis_dm = -xaxis_dm
    ycenters = -centers  # y0_dm_axis = yaxis_dm(x0_dm_idx) (README.md:219-220)

    R = resolution
    pupil_axis = (np.arange(R) - R / 2) * pixel_pitch
    lo = int(np.argmin(np.abs(xaxis_dm - pupil_axis[0])))
    hi = int(np.argmin(np.abs(xaxis_dm - pupil_axis[-1])))
    assert hi - lo + 1 == R, (lo, hi, R)

    X, Y = np.meshgrid(xaxis_dm, yaxis_dm)
    d2 = cfg.pitch ** 2
    lnc = np.log(cfg.coupling)
    maps = np.empty((cfg.n_actuators, R, R), dtype=np.float64)
    k = 0
    for i in range(cfg.n_act_side):        # y loop (rows)
        for j in range(cfg.n_act_side):    # x loop (cols)
            bump = np.exp(lnc * ((X - centers[j]) ** 2 +
                                 (Y - ycenters[i]) ** 2) / d2)
            maps[k] = bump[lo:hi + 1, lo:hi + 1]
            k += 1
    return maps


def build(
    cfg: DMConfig,
    basis: zernike.ZernikeBasis,
    pixel_pitch: float | None = None,
    dtype=jnp.float32,
) -> DMModel:
    """Modal influence matrix via Zernike LS projection (README.md:266-271)."""
    R = basis.resolution
    if pixel_pitch is None:
        # keep the reference's physical geometry at any grid resolution
        pixel_pitch = cfg.pixel_pitch * 512.0 / R
    maps = influence_maps_pupil(cfg, R, pixel_pitch)     # (n_act, R, R)

    # Zs_new (R^2, K); B = pinv(Zs'Zs) Zs' B_pupil  -- full-grid projection
    # (the reference projects over the full square, README.md:268-271)
    r_, th_, mask = zernike._grid_polar(R)
    z_full = np.zeros((R * R, basis.n_modes), dtype=np.float64)
    z_in = zernike.eval_points(basis.radial_order, r_[mask], th_[mask])
    z_full[mask.ravel(), :] = z_in
    gram = z_full.T @ z_full
    proj = np.linalg.solve(gram, z_full.T)               # (K, R^2)
    B_full = proj @ maps.reshape(cfg.n_actuators, R * R).T  # (K, n_act)

    return DMModel(
        influence=jnp.asarray(B_full[1:], dtype=dtype),
        influence_full=jnp.asarray(B_full, dtype=dtype),
        coeff_a=cfg.coeff_a,
        coeff_b=cfg.coeff_b,
    )


def rad_to_volts(u: jnp.ndarray, a: float, b: float,
                 rad_to_nm: float) -> jnp.ndarray:
    """Inverse-quadratic voltage conversion (README.md:576-583).

    u<0: V = -(-b + sqrt(b^2 - 4 a u nm))/(2a); u>=0 with +4a.
    """
    nm = u * rad_to_nm
    pos = (-b + jnp.sqrt(b * b + 4.0 * a * jnp.abs(nm))) / (2.0 * a)
    return jnp.sign(u) * pos


def apply_correction(model: DMModel, u: jnp.ndarray) -> jnp.ndarray:
    """Modal correction ad_cor = B u (README.md:590); batched matmul."""
    return u @ model.influence.T
