"""Analytic Zernike-coefficient statistics vs empirical screen fits."""

import numpy as np
import jax
import jax.numpy as jnp

from mpc_sensorlessao_tpu.ops import phase_screens, zernike, zernike_stats
from mpc_sensorlessao_tpu.utils.config import AtmosphereConfig, TelescopeConfig

ATM1 = AtmosphereConfig(fractional_r0=(1.0,), altitudes=(0.0,),
                        wind_speeds=(5.0,), wind_directions=(0.0,))


def test_analytic_variances_match_empirical():
    res, order = 32, 4
    tel = TelescopeConfig(resolution=res)
    var_th = zernike_stats.coefficient_variances(
        ATM1, tel.diameter, order, resolution=res)
    basis = zernike.make_basis(order, res)
    mask_npix = jnp.sum(basis.mask.astype(jnp.float32))

    coeffs = []
    for s in range(120):
        scr = jnp.asarray(phase_screens.synthesize_screen(
            s, ATM1, res, tel.pixel_pitch))
        ph = zernike.piston_removed_phase_masked(
            scr[:res, :res], basis.mask, mask_npix)
        coeffs.append(np.asarray(zernike.fit(basis, ph)))
    var_emp = np.var(np.stack(coeffs), axis=0)

    # non-piston low-order modes (tilt..spherical), 120 samples -> ~25% SE
    for k in range(1, 15):
        rel = abs(var_emp[k] - var_th[k]) / var_th[k]
        assert rel < 0.6, (k, var_emp[k], var_th[k], rel)
    # aggregate check much tighter
    tot_rel = abs(var_emp[1:].sum() - var_th[1:].sum()) / var_th[1:].sum()
    assert tot_rel < 0.25, tot_rel


def test_tilt_dominates_and_spectrum_decreases():
    var_th = zernike_stats.coefficient_variances(
        ATM1, 1.0, 6, resolution=40)
    modes = zernike.mode_indices(6)
    # tilt pair carries the most power (Noll)
    tilt = [var_th[k] for k, (n, m) in enumerate(modes) if n == 1]
    high = [var_th[k] for k, (n, m) in enumerate(modes) if n == 6]
    assert min(tilt) > 5 * max(high)
    # piston-removed: piston coefficient variance is tiny
    assert var_th[0] < 0.05 * max(tilt)


def test_residual_variance_decreases_with_order():
    v4 = zernike_stats.total_residual_variance(ATM1, 1.0, 4, resolution=32)
    v6 = zernike_stats.total_residual_variance(ATM1, 1.0, 6, resolution=32)
    assert 0 < v6 < v4
