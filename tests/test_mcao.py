"""Modal MCAO (modalMCAO.m + zernike smallFootprintExpansion
capability), Monte-Carlo validated against projected layered screens."""

import numpy as np
import jax
import jax.numpy as jnp

from mpc_sensorlessao_tpu.models import mcao
from mpc_sensorlessao_tpu.ops import phase_screens, relay, zernike
from mpc_sensorlessao_tpu.ops import zernike_stats as zs
from mpc_sensorlessao_tpu.utils.config import AtmosphereConfig

ARCSEC = np.pi / 180 / 3600


def test_footprint_projection_identity_at_ground():
    """Altitude 0, fov anything: ratio 1, no offset -> the identity
    padding of zernike.m:525-531."""
    dm = mcao.DMLayer(altitude=0.0, radial_order=3, skip_modes=1)
    P = mcao.footprint_projection(3, dm, 1.0, 60 * ARCSEC,
                                  direction=(10 * ARCSEC, 0.0))
    K = zernike.n_modes(3)
    expect = np.eye(K)[:, 1:]
    assert np.allclose(P, expect, atol=1e-9)


def test_footprint_projection_shrinks_modes():
    """A pure meta-pupil tilt seen through a half-size footprint is a
    tilt of half the rms amplitude (plus piston from the offset)."""
    # fov sized so D_m = 2 D at h = 8 km
    fov = 2.0 * np.arctan(0.5 / 8000.0)
    dm = mcao.DMLayer(altitude=8000.0, radial_order=1, skip_modes=0)
    P = mcao.footprint_projection(1, dm, 1.0, fov, direction=(0.0, 0.0))
    # columns: piston, sin-tilt, cos-tilt (modified ordering); on-axis
    # footprint of a meta-pupil tilt = same tilt scaled by r-ratio 1/2
    assert np.allclose(P[:, 0], [1.0, 0.0, 0.0], atol=1e-9)
    assert np.allclose(P[1:, 1], [0.5, 0.0], atol=1e-6)
    assert np.allclose(P[1:, 2], [0.0, 0.5], atol=1e-6)


def test_mcao_on_axis_single_dm_matches_scao():
    """1 ground DM, 1 on-axis GS, on-axis science, no noise: the MCAO
    residual must equal the ideal modal corrector's (scaoVariance,
    modalMCAO.m:110-112)."""
    atm = AtmosphereConfig(fractional_r0=(1.0,), altitudes=(0.0,),
                           wind_speeds=(5.0,), wind_directions=(0.0,))
    m = mcao.build(atm, 1.0, 60 * ARCSEC,
                   [mcao.DMLayer(0.0, 3)], 3, [(0.0, 0.0)])
    assert m.mcao_var_rad2 < m.piston_free_var_rad2
    assert abs(m.mcao_var_rad2 - m.scao_var_rad2) < 0.05 * m.scao_var_rad2


def _two_layer_setup():
    atm = AtmosphereConfig(fractional_r0=(0.6, 0.4),
                           altitudes=(0.0, 8000.0),
                           wind_speeds=(5.0, 5.0),
                           wind_directions=(0.0, 0.0))
    th = 10 * ARCSEC
    gs = [(th, 0.0), (-th / 2, th * 0.866), (-th / 2, -th * 0.866)]
    sci = [(0.0, 0.0), (th, 0.0)]
    fov = 4.0 * th
    return atm, gs, sci, fov


def test_mcao_two_dm_beats_one_dm_off_axis():
    atm, gs, sci, fov = _two_layer_setup()
    order = 3
    two = mcao.build(atm, 1.0, fov,
                     [mcao.DMLayer(0.0, order),
                      mcao.DMLayer(8000.0, order, skip_modes=3)],
                     order, gs, sci)
    one = mcao.build(atm, 1.0, fov, [mcao.DMLayer(0.0, order)],
                     order, gs, sci)
    assert two.mcao_var_rad2 < one.mcao_var_rad2
    # the off-axis direction is where the altitude DM pays
    assert two.target_vars_rad2[1] < 0.9 * one.target_vars_rad2[1]
    # noise raises the predicted residual
    noisy = mcao.build(atm, 1.0, fov,
                       [mcao.DMLayer(0.0, order),
                        mcao.DMLayer(8000.0, order, skip_modes=3)],
                       order, gs, sci, noise_cov=0.05)
    assert noisy.mcao_var_rad2 > two.mcao_var_rad2


def test_mcao_monte_carlo_matches_prediction():
    """Simulated layered screens through the MCAO loop: the measured
    modal residual in each science direction must match the analytic
    prediction (target_var - scao_var = the modeled-mode part)."""
    atm, gs, sci, fov = _two_layer_setup()
    order, D, R = 3, 1.0, 48
    pitch = D / (R - 1)
    m = mcao.build(atm, D, fov,
                   [mcao.DMLayer(0.0, order),
                    mcao.DMLayer(8000.0, order, skip_modes=3)],
                   order, gs, sci)

    basis = zernike.make_basis(order, R)
    mask_npix = jnp.sum(basis.mask.astype(jnp.float32))
    fit = basis.fit_full
    Nf = zs.norm_factors(order)[1:]
    dirs = list(sci) + list(gs)
    alts = atm.altitudes

    @jax.jit
    def all_coeffs(scr0, scr1):
        def coeffs_of(ph):
            p2 = zernike.piston_removed_phase_masked(
                ph, basis.mask, mask_npix)
            return (fit @ p2.reshape(-1))[1:]
        return jnp.stack([coeffs_of(relay.project_layers(
            [scr0, scr1], [pitch, pitch], D / 2, alts, R, direction=d))
            for d in dirs])

    sig2 = 0.02
    m_noisy = mcao.build(atm, D, fov,
                         [mcao.DMLayer(0.0, order),
                          mcao.DMLayer(8000.0, order, skip_modes=3)],
                         order, gs, sci, noise_cov=sig2)
    rng = np.random.default_rng(11)
    resid, resid_n = [], []
    slab0, slab1 = atm.layer(0), atm.layer(1)
    for s in range(120):
        scr0 = jnp.asarray(np.asarray(phase_screens.synthesize_screen(
            2 * s, slab0, 192, pitch, oversample=1)))
        scr1 = jnp.asarray(np.asarray(phase_screens.synthesize_screen(
            2 * s + 1, slab1, 192, pitch, oversample=1)))
        c = np.asarray(all_coeffs(scr0, scr1)) / Nf[None, :]  # -> Noll
        u = np.asarray(mcao.correct(
            m, jnp.asarray(c[len(sci):], jnp.float32)))
        res_k = [c[k] - np.asarray(mcao.correction_coeffs(m, u, k))
                 for k in range(len(sci))]
        resid.append([float(np.sum(r ** 2)) for r in res_k])
        # same screens, noisy guide-star coefficients through the
        # noise-regularized command matrix: checks the propagated-noise
        # term tr(Pk'Pk M Cn M') in the analytic residual
        cn = c[len(sci):] + rng.normal(
            size=c[len(sci):].shape) * np.sqrt(sig2)
        un = np.asarray(mcao.correct(
            m_noisy, jnp.asarray(cn, jnp.float32)))
        resn_k = [c[k] - np.asarray(mcao.correction_coeffs(m_noisy, un, k))
                  for k in range(len(sci))]
        resid_n.append([float(np.sum(r ** 2)) for r in resn_k])
    mc = np.mean(np.asarray(resid), axis=0)
    pred = m.target_vars_rad2 - m.scao_var_rad2
    for k in range(len(sci)):
        assert 0.5 * pred[k] < mc[k] < 2.0 * pred[k], (k, mc, pred)
    mc_n = np.mean(np.asarray(resid_n), axis=0)
    pred_n = m_noisy.target_vars_rad2 - m_noisy.scao_var_rad2
    for k in range(len(sci)):
        assert 0.5 * pred_n[k] < mc_n[k] < 2.0 * pred_n[k], (
            k, mc_n, pred_n)
    # and correcting helps: residual well below the uncorrected modal var
    open_var = float(np.sum(np.diag(zs.covariance_analytic(
        atm, D, order, normalized=True))[1:]))
    assert mc[0] < 0.35 * open_var
