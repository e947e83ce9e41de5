"""Deformable-mirror model: Gaussian / Bezier influence functions, modal
influence matrix, and rad<->Volt conversion.

Re-derivation of the reference's DM section (reference: README.md:193-271):
a 12x12 actuator grid with Gaussian influence functions
I_j = exp(ln(c) ((x-x0)^2+(y-y0)^2)/d^2), sampled on the DM grid, cropped to
the pupil plane and projected onto the Zernike stack with
B = pinv(Zs' Zs) Zs' B_pupil  (README.md:271).  Everything is built once on
host in float64 (setup-time), shipped to device as the (nx, n_act) modal
influence matrix with the piston row deleted (README.md:290).

Also provides the OOMAO `influenceFunction` capability (bundled but
unused by the reference pipeline, SURVEY.md 2d): separable cubic-Bezier
influence profiles with 'monotonic' / 'overshoot' presets
(influenceFunction.m:49-119 control points, :253-283 separable 2-D
modes), selectable via DMConfig.influence.
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


def bezier_profile(mech_coupling: float, preset: str = "monotonic"):
    """1-D cubic-Bezier influence profile (influenceFunction.m:49-119).

    Two cubic Bezier segments through 7 control points; presets
    'monotonic' {0.2,[0.4,0.7],[0.6,0.4],1,1} and 'overshoot'
    {0.2,[0.4,0.7],[0.5,0.4],0.3,1} (influenceFunction.m:57-62).  The
    abscissa is rescaled so profile(1 actuator pitch) = mech_coupling
    (influenceFunction.m:116-117).  Returns (eval(r), support_radius)
    with eval vectorized over |r| in pitch units, zero outside support.
    """
    presets = {
        "monotonic": (0.2, (0.4, 0.7), (0.6, 0.4), 1.0, 1.0),
        "overshoot": (0.2, (0.4, 0.7), (0.5, 0.4), 0.3, 1.0),
    }
    if preset not in presets:
        raise ValueError(f"unknown bezier preset '{preset}'")
    c1, c2, c3, c4, c5 = presets[preset]
    P = np.zeros((7, 2))
    P[0] = [0.0, 1.0]
    P[1] = [c1, 1.0]
    P[2] = c2
    P[3] = c3
    P[4] = (-1.0 / c4) * P[2] + (1.0 + 1.0 / c4) * P[3]
    P[5] = [c5, 0.0]
    P[6] = [2.0, 0.0]
    t = np.linspace(0.0, 1.0, 101)[:, None]
    seg1 = ((1 - t) ** 3 * P[0] + 3 * (1 - t) ** 2 * t * P[1]
            + 3 * (1 - t) * t ** 2 * P[2] + t ** 3 * P[3])
    t = t[1:]
    seg2 = ((1 - t) ** 3 * P[3] + 3 * (1 - t) ** 2 * t * P[4]
            + 3 * (1 - t) * t ** 2 * P[5] + t ** 3 * P[6])
    curve = np.concatenate([seg1, seg2])                  # (201, 2) x, y
    x, y = curve[:, 0], curve[:, 1]
    # x rescale so that profile(1) = mech_coupling: invert y(x) where y is
    # decreasing over the probed range (influenceFunction.m:116)
    from scipy.interpolate import CubicSpline
    dec = np.argsort(y)
    x_scale = float(CubicSpline(y[dec], x[dec])(mech_coupling))
    x = x / x_scale
    # symmetric extension, cubic spline through mirrored samples
    u = np.concatenate([-x[::-1], x[1:]])
    v = np.concatenate([y[::-1], y[1:]])
    sp = CubicSpline(u, v)
    support = float(x[-1])

    def evaluate(r):
        r = np.asarray(r, dtype=np.float64)
        out = np.where(np.abs(r) <= support, sp(np.clip(r, -support,
                                                        support)), 0.0)
        return out

    return evaluate, support


def influence_maps_pupil_bezier(
    cfg: DMConfig, resolution: int, pixel_pitch: float, preset: str
) -> np.ndarray:
    """Separable Bezier 2-D modes, same geometry as the Gaussian build
    (mode = w(y - y0) w(x - x0), influenceFunction.m:271-283)."""
    profile, _ = bezier_profile(cfg.coupling, preset)
    len_dm, xaxis_dm, centers = _dm_grid_axes(cfg, pixel_pitch)
    yaxis_dm = -xaxis_dm
    ycenters = -centers

    R = resolution
    pupil_axis = (np.arange(R) - R / 2) * pixel_pitch
    lo = int(np.argmin(np.abs(xaxis_dm - pupil_axis[0])))
    hi = int(np.argmin(np.abs(xaxis_dm - pupil_axis[-1])))

    wu = np.stack([profile((xaxis_dm - c) / cfg.pitch) for c in centers])
    wv = np.stack([profile((yaxis_dm - c) / cfg.pitch) for c in ycenters])
    maps = np.empty((cfg.n_actuators, R, R), dtype=np.float64)
    k = 0
    for i in range(cfg.n_act_side):
        for j in range(cfg.n_act_side):
            maps[k] = np.outer(wv[i], wu[j])[lo:hi + 1, lo:hi + 1]
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
    if cfg.influence == "gaussian":
        maps = influence_maps_pupil(cfg, R, pixel_pitch)  # (n_act, R, R)
    elif cfg.influence.startswith("bezier_"):
        maps = influence_maps_pupil_bezier(
            cfg, R, pixel_pitch, cfg.influence[len("bezier_"):])
    else:
        raise ValueError(f"unknown DM influence '{cfg.influence}'")

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
