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


# ---------------- spectral-domain analytics (zernikeStats.m surface) -------

ATM_KOL = AtmosphereConfig(r0=1.0, L0=1e6, fractional_r0=(1.0,),
                           altitudes=(0.0,), wind_speeds=(5.0,),
                           wind_directions=(0.0,))


def test_noll_residual_variance_table():
    """Delta_J for Kolmogorov (L0 -> inf) against Noll 1976 Table IV."""
    noll = {1: 1.0299, 3: 0.134, 6: 0.0648, 10: 0.0401}
    for j, ref in noll.items():
        val = zernike_stats.residual_variance(j, ATM_KOL, 1.0)
        assert abs(val - ref) / ref < 0.02, (j, val, ref)
    # scaling (D/r0)^{5/3}
    atm2 = AtmosphereConfig(r0=0.5, L0=1e6, fractional_r0=(1.0,),
                            altitudes=(0.0,), wind_speeds=(5.0,),
                            wind_directions=(0.0,))
    r = (zernike_stats.residual_variance(3, atm2, 1.0)
         / zernike_stats.residual_variance(3, ATM_KOL, 1.0))
    assert abs(r - 2 ** (5.0 / 3.0)) < 0.02


def test_analytic_covariance_matches_grid_fit():
    """Spectral-domain covariance == grid-propagated covariance (the
    pipeline's own fit operator) in the framework convention."""
    Ca = zernike_stats.covariance_analytic(ATM1, 1.0, 4)
    Cg = zernike_stats.coefficient_covariance(ATM1, 1.0, 4, resolution=48)
    scale = np.abs(Ca[1:, 1:]).max()
    assert np.abs(Ca - Cg)[1:, 1:].max() < 0.01 * scale
    va = zernike_stats.variance_analytic(ATM1, 1.0, 4)
    assert np.allclose(va, np.diag(Ca), rtol=1e-6)


def test_temporal_spectrum_sum_rule_and_shape():
    """integral S_j dnu = sigma_j^2 (Parseval) and low-pass shape."""
    nu = np.linspace(0.0, 400.0, 1501)
    S = zernike_stats.temporal_spectrum_analytic(nu, ATM1, 1.0, 3)
    var = zernike_stats.variance_analytic(ATM1, 1.0, 3)
    integ = 2.0 * np.trapezoid(S, nu, axis=0)
    for k in range(1, 10):
        assert abs(integ[k] - var[k]) / var[k] < 0.05, k
    # spectra decay by orders of magnitude across the band
    assert S[-1, 1] < 1e-4 * S[0, 1]


def test_angular_covariance_limits_and_anisoplanatism():
    atm = AtmosphereConfig(fractional_r0=(1.0,), altitudes=(5000.0,),
                           wind_speeds=(5.0,), wind_directions=(0.0,))
    C0 = zernike_stats.angular_covariance_analytic(atm, 1.0, 3, 0.0)
    Cb = zernike_stats.covariance_analytic(atm, 1.0, 3)
    assert np.abs(C0 - Cb).max() < 1e-5
    a1 = zernike_stats.anisoplanatism_variance(atm, 1.0, 3, 5e-6)
    a2 = zernike_stats.anisoplanatism_variance(atm, 1.0, 3, 5e-5)
    assert 0 < a1 < a2
    # ground layer: no anisoplanatism
    ag = zernike_stats.anisoplanatism_variance(ATM1, 1.0, 3, 5e-5)
    assert ag < 1e-6 * a2


def test_var_spectrum_cross_checks_analytic():
    """The identified VAR model's implied PSD agrees with the analytic
    frozen-flow temporal spectrum where the power lives (low frequency),
    and integrates to the sample variance -- the zernikeStats analytics
    validating the pipeline's system ID (SURVEY.md L3)."""
    import dataclasses
    import jax
    from mpc_sensorlessao_tpu.models import pipeline, var
    from mpc_sensorlessao_tpu.utils.config import reference_config
    cfg = reference_config(resolution=64)
    cfg = cfg.replace(sim=dataclasses.replace(cfg.sim, n_train=1000,
                                              n_valid=100))
    system = pipeline.build(cfg, jax.random.PRNGKey(0))
    states = np.asarray(system.coeff_series)[:, 1:]
    Sw = var.innovation_covariance(system.var_model, states[:1000])
    S1 = var.power_spectrum(system.var_model, Sw, [1.0], 200.0)[0]
    San = zernike_stats.temporal_spectrum_analytic(
        [1.0], cfg.atmosphere, cfg.telescope.diameter,
        cfg.zernike.radial_order)[0, 1:]
    # tilt PSD at 1 Hz within a factor 3 (one-realization ID scatter)
    assert 1.0 / 3.0 < S1[0] / San[0] < 3.0
    # integrated VAR PSD == sample variance (Parseval through the model)
    nuf = np.linspace(-100.0, 100.0, 2001)
    vi = np.trapezoid(var.power_spectrum(system.var_model, Sw, nuf, 200.0),
                      nuf, axis=0)
    sample = states[:1000].var(axis=0)
    assert 0.5 < vi[0] / sample[0] < 2.0


def test_residue_family_consistency():
    """Grid-projector residue statistics vs the independent spectral
    path: mean(residueVarianceMap) == Delta_J, residueStrehlRatio ==
    Marechal in the weak-turbulence limit, entrapped energy < 1."""
    atm_w = AtmosphereConfig(r0=1.0, fractional_r0=(1.0,),
                             altitudes=(0.0,), wind_speeds=(5.0,),
                             wind_directions=(0.0,))
    vm = zernike_stats.residue_variance_map(atm_w, 1.0, 4, resolution=32)
    delta = zernike_stats.residual_variance(15, atm_w, 1.0)
    assert abs(np.nanmean(vm) - delta) < 0.05 * delta
    # the map is spatially non-trivial but everywhere positive
    assert np.nanmin(vm) > 0
    sr = zernike_stats.residue_strehl_ratio(atm_w, 1.0, 4, resolution=32)
    assert abs(sr - np.exp(-delta)) < 0.01
    ee = zernike_stats.residue_entrapped_energy(atm_w, 1.0, 4, 2.0,
                                                resolution=32)
    assert 0.9 < ee < 1.0


def test_closed_loop_variance_and_tilt_analytics():
    clv = zernike_stats.closed_loop_variance(ATM1, 1.0, 3, T=1 / 200,
                                             tau=1 / 200, gain=0.5)
    ol = zernike_stats.variance_analytic(ATM1, 1.0, 3)
    # 200 Hz integrator rejects slow turbulence by orders of magnitude
    assert clv[1] < 0.02 * ol[1]
    # gain -> 0 recovers the open-loop variance
    clv0 = zernike_stats.closed_loop_variance(ATM1, 1.0, 3, T=1 / 200,
                                              tau=1 / 200, gain=1e-6)
    assert abs(clv0[1] / ol[1] - 1.0) < 0.05
    atm5 = AtmosphereConfig(fractional_r0=(1.0,), altitudes=(5000.0,),
                            wind_speeds=(5.0,), wind_directions=(0.0,))
    a = zernike_stats.anisokinetism_variance(atm5, 1.0, 5e-6)
    b = zernike_stats.anisokinetism_variance(atm5, 1.0, 5e-5)
    assert 0 < a < b
    ang = zernike_stats.anisokinetism_angle_arcsec(atm5, 1.0)
    # the 1 rad^2 angle is where the curve crosses 1
    v = zernike_stats.anisokinetism_variance(
        atm5, 1.0, ang / zernike_stats.phase_stats.RADIAN2ARCSEC)
    assert abs(v - 1.0) < 0.05


def test_kolmogorov_l0_inf_supported():
    """L0 = inf (pure Kolmogorov) is a supported AtmosphereConfig; the
    analytic family must not crash on it (filtered integrals converge)."""
    import math
    atm = AtmosphereConfig(r0=0.5, L0=math.inf, fractional_r0=(1.0,),
                           altitudes=(0.0,), wind_speeds=(5.0,),
                           wind_directions=(0.0,))
    d3 = zernike_stats.residual_variance(3, atm, 1.0)
    assert abs(d3 - 0.134 * 2 ** (5.0 / 3.0)) < 0.02 * d3
    v = zernike_stats.variance_analytic(atm, 1.0, 3)
    assert np.isfinite(v).all() and (v[1:] > 0).all()
