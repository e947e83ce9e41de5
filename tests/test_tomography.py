"""Modal multi-guide-star tomography (linearMMSE.m 'modal' capability),
Monte-Carlo validated against projected layered screens."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mpc_sensorlessao_tpu.models import tomography
from mpc_sensorlessao_tpu.ops import phase_screens, relay, zernike
from mpc_sensorlessao_tpu.ops import zernike_stats as zs
from mpc_sensorlessao_tpu.utils.config import AtmosphereConfig

ARCSEC = np.pi / 180 / 3600


def test_tomography_reconstructs_single_layer():
    """3 guide stars on a 15-arcsec triangle, science on-axis, one
    8-km layer: the tomographic estimate must match the analytic error
    prediction and beat the nearest single guide star by >10x."""
    atm = AtmosphereConfig(fractional_r0=(1.0,), altitudes=(8000.0,),
                           wind_speeds=(5.0,), wind_directions=(0.0,))
    D, R, order = 1.0, 48, 3
    pitch = D / (R - 1)
    th = 15 * ARCSEC
    gs = [(th, 0.0), (-th / 2, th * 0.866), (-th / 2, -th * 0.866)]
    tomo = tomography.build(atm, D, order, gs)

    basis = zernike.make_basis(order, R)
    mask_npix = jnp.sum(basis.mask.astype(jnp.float32))
    fit = basis.fit_full
    dirs = [(0.0, 0.0)] + gs

    @jax.jit
    def all_coeffs(scr):
        def coeffs_of(ph):
            p2 = zernike.piston_removed_phase_masked(
                ph, basis.mask, mask_npix)
            return (fit @ p2.reshape(-1))[1:]
        return jnp.stack([coeffs_of(relay.project_layers(
            [scr], [pitch], D / 2, atm.altitudes, R, direction=d))
            for d in dirs])

    Nf = zs.norm_factors(order)[1:]
    et, es = [], []
    for s in range(150):
        scr = jnp.asarray(np.asarray(phase_screens.synthesize_screen(
            s, atm, 192, pitch, oversample=1)))
        c = np.asarray(all_coeffs(scr))
        est = np.asarray(tomography.estimate(
            tomo, jnp.asarray(c[1:], jnp.float32)))
        et.append((est - c[0]) / Nf)
        es.append((c[1] - c[0]) / Nf)
    mc_tomo = float((np.stack(et) ** 2).sum(1).mean())
    mc_single = float((np.stack(es) ** 2).sum(1).mean())
    # analytic error prediction within MC + discretization tolerance
    assert 0.6 * tomo.err_var_rad2 < mc_tomo < 1.7 * tomo.err_var_rad2
    assert mc_tomo < 0.1 * mc_single
    assert 0 < tomo.strehl_marechal < 1


def test_tomography_limits():
    atm = AtmosphereConfig(fractional_r0=(1.0,), altitudes=(8000.0,),
                           wind_speeds=(5.0,), wind_directions=(0.0,))
    # guide star ON the science direction, no noise -> near-zero error
    t0 = tomography.build(atm, 1.0, 3, [(0.0, 0.0)])
    assert t0.err_var_rad2 < 1e-3
    # far-away guide star -> error approaches the open-loop variance
    Nf = zs.norm_factors(3)[1:]
    open_var = float(np.sum(np.diag(
        zs.covariance_analytic(atm, 1.0, 3))[1:] / Nf ** 2))
    tfar = tomography.build(atm, 1.0, 3, [(300 * ARCSEC, 0.0)])
    assert tfar.err_var_rad2 > 0.7 * open_var
    # noise raises the predicted error
    tn = tomography.build(atm, 1.0, 3, [(15 * ARCSEC, 0.0)],
                          noise_cov=0.1)
    tq = tomography.build(atm, 1.0, 3, [(15 * ARCSEC, 0.0)])
    assert tn.err_var_rad2 > tq.err_var_rad2
