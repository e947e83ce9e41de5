"""Spatial slopes-MMSE reconstructor (slopesLinearMMSE.m capability)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_sensorlessao_tpu.models import slopes_mmse, wfs
from mpc_sensorlessao_tpu.ops import phase_screens, toeplitz
from mpc_sensorlessao_tpu.utils.config import AtmosphereConfig, TelescopeConfig

ATM = AtmosphereConfig(fractional_r0=(1.0,), altitudes=(0.0,),
                       wind_speeds=(5.0,), wind_directions=(0.0,))
R, NL = 80, 10


@pytest.fixture(scope="module")
def setup():
    tel = TelescopeConfig(resolution=R)
    sh = wfs.build(R, n_lenslet=NL)
    return tel, sh


def test_kernels_match_empirical_covariances(setup):
    """TBT covariance generators vs empirical square-aperture block-slope
    covariances over synthesized Von Karman screens."""
    tel, _ = setup
    pitch = tel.pixel_pitch
    sub = R // NL
    model = slopes_mmse.build(ATM, tel.diameter, NL,
                              np.ones((NL, NL), bool), noise_var=0.0)
    S = 200
    sl = np.zeros((S, 2 * NL * NL))
    ph = np.zeros((S, (NL + 1) ** 2))
    idx = np.clip(np.arange(NL + 1) * sub, 0, R - 1)
    for s in range(S):
        scr = np.asarray(phase_screens.synthesize_screen(
            s, ATM, R, pitch))[:R, :R].astype(np.float64)
        gx = np.gradient(scr, pitch, axis=1)
        gy = np.gradient(scr, pitch, axis=0)
        sl[s] = np.concatenate([
            gx.reshape(NL, sub, NL, sub).mean((1, 3)).ravel(),
            gy.reshape(NL, sub, NL, sub).mean((1, 3)).ravel()])
        ph[s] = scr[np.ix_(idx, idx)].ravel()
    sl -= sl.mean(0)
    ph -= ph.mean(0)
    n2 = NL * NL
    Cxx_emp = sl.T @ sl / S
    Cox_emp = ph.T @ sl / S

    def corr(a, b):
        return np.corrcoef(a.ravel(), b.ravel())[0, 1]

    assert corr(Cxx_emp[:n2, :n2], toeplitz.full(model.cxx)) > 0.9
    assert corr(Cxx_emp[n2:, n2:], toeplitz.full(model.cyy)) > 0.9
    assert corr(Cox_emp[:, :n2], toeplitz.full(model.cox)) > 0.7
    assert corr(Cox_emp[:, n2:], toeplitz.full(model.coy)) > 0.7
    # variance scale within sample scatter
    r = np.diag(Cxx_emp[:n2, :n2]).mean() / np.diag(
        toeplitz.full(model.cxx)).mean()
    assert 0.7 < r < 1.3, r


def _zonal_ls(sh):
    """Naive zonal LS baseline: pinv of the corner-bump interaction."""
    sub = R // NL
    idx = np.clip(np.arange(NL + 1) * sub, 0, R - 1)
    n_c = (NL + 1) ** 2
    D = np.zeros((sh.n_slopes, n_c))
    yy, xx = np.meshgrid(np.arange(R), np.arange(R), indexing="ij")
    for c in range(n_c):
        ci, cj = divmod(c, NL + 1)
        t = (np.maximum(0, 1 - np.abs(yy - idx[ci]) / sub)
             * np.maximum(0, 1 - np.abs(xx - idx[cj]) / sub))
        D[:, c] = np.asarray(wfs.geometric_slopes(
            sh, jnp.asarray(t, dtype=jnp.float32)))
    return np.linalg.pinv(D, rcond=1e-3), idx


def test_mmse_beats_zonal_ls_under_noise(setup):
    """The VERDICT 'done' criterion: spatial MMSE reconstruction beats
    the zonal LS reconstructor under measurement noise (measured ~5x)."""
    tel, sh = setup
    pitch = tel.pixel_pitch
    Rls, idx = _zonal_ls(sh)
    sigma_px = 0.05
    model = slopes_mmse.build(ATM, tel.diameter, NL, sh.valid,
                              noise_var=(sigma_px / pitch) ** 2)
    rng = np.random.default_rng(1)
    pm = (np.hypot(*np.meshgrid(np.arange(NL + 1) - NL / 2,
                                np.arange(NL + 1) - NL / 2))
          <= NL / 2 + 0.5).ravel()
    errs = {"mmse": [], "ls": []}
    for s in range(8):
        scr = np.asarray(phase_screens.synthesize_screen(
            1000 + s, ATM, R, pitch))[:R, :R].astype(np.float64)
        scr -= scr.mean()
        truth = scr[np.ix_(idx, idx)].ravel()
        noisy = (np.asarray(wfs.geometric_slopes(
            sh, jnp.asarray(scr, dtype=jnp.float32)))
            + rng.normal(0, sigma_px, 2 * sh.n_valid))
        phi = np.asarray(slopes_mmse.reconstruct(
            model, jnp.asarray(noisy, dtype=jnp.float32), pitch)).ravel()
        phi_ls = Rls @ noisy
        for name, est in (("mmse", phi), ("ls", phi_ls)):
            e = est[pm] - truth[pm]
            e -= e.mean()
            errs[name].append(np.sqrt((e ** 2).mean()))
        if s == 0:
            turb = truth[pm].std()
    mmse, ls = np.mean(errs["mmse"]), np.mean(errs["ls"])
    assert mmse < 0.5 * ls, (mmse, ls)
    assert mmse < 0.35 * turb, (mmse, turb)   # useful single-frame rec.


def test_reconstruct_is_jit_batched(setup):
    tel, sh = setup
    model = slopes_mmse.build(ATM, tel.diameter, NL, sh.valid,
                              noise_var=1.0)
    batch = jnp.zeros((3, 2 * sh.n_valid))
    out = jax.vmap(lambda s: slopes_mmse.reconstruct(
        model, s, tel.pixel_pitch))(batch)
    assert out.shape == (3, NL + 1, NL + 1)
    assert np.isfinite(np.asarray(out)).all()


def test_off_axis_mmse_beats_naive_reconstruction(setup):
    """mmse_dir (the deltaSrc branch, slopesLinearMMSE.m:119-127,363):
    reconstructing an off-axis science direction from on-axis slopes
    through a high layer beats naively reusing the on-axis
    reconstruction (measured ~2.5x)."""
    from mpc_sensorlessao_tpu.ops import relay
    tel, sh = setup
    pitch = tel.pixel_pitch
    atm_h = AtmosphereConfig(fractional_r0=(1.0,), altitudes=(8000.0,),
                             wind_speeds=(5.0,), wind_directions=(0.0,))
    arcsec = np.pi / 180 / 3600
    dth = (10 * arcsec, 0.0)
    m_on = slopes_mmse.build(atm_h, tel.diameter, NL, sh.valid,
                             noise_var=1e-6)
    m_off = slopes_mmse.build(atm_h, tel.diameter, NL, sh.valid,
                              noise_var=1e-6, mmse_dir=dth)
    sub = R // NL
    idx = np.clip(np.arange(NL + 1) * sub, 0, R - 1)
    pm = (np.hypot(*np.meshgrid(np.arange(NL + 1) - NL / 2,
                                np.arange(NL + 1) - NL / 2))
          <= NL / 2 + 0.5).ravel()
    e_off, e_on = [], []
    for s in range(10):
        scr = jnp.asarray(np.asarray(phase_screens.synthesize_screen(
            400 + s, atm_h, 192, pitch, oversample=1)))
        ph_on = np.array(relay.project_layers(
            [scr], [pitch], tel.diameter / 2, atm_h.altitudes, R,
            direction=(0.0, 0.0)))
        ph_off = np.array(relay.project_layers(
            [scr], [pitch], tel.diameter / 2, atm_h.altitudes, R,
            direction=dth))
        slopes = np.asarray(wfs.geometric_slopes(
            sh, jnp.asarray(ph_on - ph_on.mean(), jnp.float32)))
        truth = (ph_off - ph_off.mean())[np.ix_(idx, idx)].ravel()
        for model, acc in ((m_off, e_off), (m_on, e_on)):
            rec = np.asarray(slopes_mmse.reconstruct(
                model, jnp.asarray(slopes, jnp.float32), pitch)).ravel()
            e = rec[pm] - truth[pm]
            e -= e.mean()
            acc.append(np.sqrt((e ** 2).mean()))
    assert np.mean(e_off) < 0.6 * np.mean(e_on)


def test_multi_gs_zonal_tomography(setup):
    """3-guide-star zonal tomography (the reference's NGS meta-matrix,
    slopesLinearMMSE.m:110-127) reconstructs the on-axis wavefront from
    off-axis slopes ~4x better than the best single guide star."""
    from mpc_sensorlessao_tpu.ops import relay
    tel, sh = setup
    pitch = tel.pixel_pitch
    atm_h = AtmosphereConfig(fractional_r0=(1.0,), altitudes=(8000.0,),
                             wind_speeds=(5.0,), wind_directions=(0.0,))
    arcsec = np.pi / 180 / 3600
    th = 10 * arcsec
    gs = [(th, 0.0), (-th / 2, th * 0.866), (-th / 2, -th * 0.866)]
    tomo = slopes_mmse.build_tomographic(atm_h, tel.diameter, NL,
                                         sh.valid, 1e-6, gs)
    m1 = slopes_mmse.build(atm_h, tel.diameter, NL, sh.valid, 1e-6,
                           mmse_dir=(-th, 0.0))
    # operator symmetry (CG requirement)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(3 * 2 * NL * NL,)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3 * 2 * NL * NL,)), jnp.float32)
    a = float(jnp.vdot(w, slopes_mmse._apply_cxx_tomo(tomo, v)))
    b = float(jnp.vdot(v, slopes_mmse._apply_cxx_tomo(tomo, w)))
    assert abs(a - b) < 1e-3 * max(abs(a), 1.0)

    sub = R // NL
    idx = np.clip(np.arange(NL + 1) * sub, 0, R - 1)
    pm = (np.hypot(*np.meshgrid(np.arange(NL + 1) - NL / 2,
                                np.arange(NL + 1) - NL / 2))
          <= NL / 2 + 0.5).ravel()
    e_t, e_1 = [], []
    for s in range(8):
        scr = jnp.asarray(np.asarray(phase_screens.synthesize_screen(
            700 + s, atm_h, 192, pitch, oversample=1)))

        def see(dd):
            return np.array(relay.project_layers(
                [scr], [pitch], tel.diameter / 2, atm_h.altitudes, R,
                direction=dd))

        ph = see((0.0, 0.0))
        truth = (ph - ph.mean())[np.ix_(idx, idx)].ravel()
        sl = np.stack([np.asarray(wfs.geometric_slopes(
            sh, jnp.asarray(see(g) - see(g).mean(), jnp.float32)))
            for g in gs])
        rec = np.asarray(slopes_mmse.reconstruct_tomographic(
            tomo, jnp.asarray(sl, jnp.float32), pitch)).ravel()
        rec1 = np.asarray(slopes_mmse.reconstruct(
            m1, jnp.asarray(sl[0], jnp.float32), pitch)).ravel()
        for est, acc in ((rec, e_t), (rec1, e_1)):
            e = est[pm] - truth[pm]
            e -= e.mean()
            acc.append(np.sqrt((e ** 2).mean()))
    assert np.mean(e_t) < 0.4 * np.mean(e_1)


def test_frozen_flow_prediction_lag(setup):
    """lag > 0 (the reference's CoxLag capability): reconstructing the
    wavefront 8 frames AHEAD of the slopes under frozen flow beats the
    zero-lag reconstructor ~3x (and the wrong-sign displacement is worse
    than zero-lag, pinning the convention)."""
    from mpc_sensorlessao_tpu.ops import phase_screens
    tel, sh = setup
    pitch = tel.pixel_pitch
    atm_w = AtmosphereConfig(fractional_r0=(1.0,), altitudes=(0.0,),
                             wind_speeds=(8.0,), wind_directions=(0.3,))
    lag_steps = 8
    lag = lag_steps * tel.sampling_time
    models = {
        "pred": slopes_mmse.build(atm_w, tel.diameter, NL, sh.valid,
                                  1e-6, lag=lag),
        "zero": slopes_mmse.build(atm_w, tel.diameter, NL, sh.valid,
                                  1e-6),
    }
    layers = phase_screens.make_layers(3, atm_w, tel)
    sub = R // NL
    idx = np.clip(np.arange(NL + 1) * sub, 0, R - 1)
    pm = (np.hypot(*np.meshgrid(np.arange(NL + 1) - NL / 2,
                                np.arange(NL + 1) - NL / 2))
          <= NL / 2 + 0.5).ravel()
    errs = {k: [] for k in models}
    for t in range(0, 320, 40):
        ph_t = np.array(phase_screens.phase_at(layers, float(t), R))
        ph_f = np.array(phase_screens.phase_at(layers,
                                               float(t + lag_steps), R))
        ph_t -= ph_t.mean()
        ph_f -= ph_f.mean()
        slopes = np.asarray(wfs.geometric_slopes(
            sh, jnp.asarray(ph_t, jnp.float32)))
        truth = ph_f[np.ix_(idx, idx)].ravel()
        for k, m in models.items():
            rec = np.asarray(slopes_mmse.reconstruct(
                m, jnp.asarray(slopes, jnp.float32), pitch)).ravel()
            e = rec[pm] - truth[pm]
            e -= e.mean()
            errs[k].append(np.sqrt((e ** 2).mean()))
    assert np.mean(errs["pred"]) < 0.5 * np.mean(errs["zero"])


def test_lgs_infinite_height_matches_ngs(setup):
    """build_lgs at (numerically) infinite guide-star height must
    reproduce the NGS reconstructor (g=1, pad=0, identity interp)."""
    tel, sh = setup
    m_ngs = slopes_mmse.build(ATM, tel.diameter, NL, sh.valid, 1e-2)
    m_lgs = slopes_mmse.build_lgs(ATM, tel.diameter, NL, sh.valid, 1e-2,
                                  lgs_height=float("inf"))
    rng = np.random.default_rng(3)
    s = jnp.asarray(rng.normal(size=(2 * sh.n_valid,)), jnp.float32)
    a = np.asarray(slopes_mmse.reconstruct(m_ngs, s, tel.pixel_pitch))
    b = np.asarray(slopes_mmse.reconstruct_lgs(m_lgs, s, tel.pixel_pitch))
    assert np.allclose(a, b, atol=1e-4 * max(1.0, np.abs(a).max()))


def test_lgs_cone_reconstruction_beats_ngs_model(setup):
    """The LGS branch (slopesLinearMMSE.m:128-156): slopes measured
    through a Rayleigh-beacon cone (H=20 km) on a high layer (8 km,
    g=0.6) reconstruct the SCIENCE (infinite-height) wavefront; the
    cone-aware model must beat the NGS model fed the same slopes."""
    from mpc_sensorlessao_tpu.ops import relay
    tel, sh = setup
    pitch = tel.pixel_pitch
    atm_h = AtmosphereConfig(fractional_r0=(1.0,), altitudes=(8000.0,),
                             wind_speeds=(5.0,), wind_directions=(0.0,))
    H = 20e3
    m_lgs = slopes_mmse.build_lgs(atm_h, tel.diameter, NL, sh.valid,
                                  1e-6, lgs_height=H)
    m_ngs = slopes_mmse.build(atm_h, tel.diameter, NL, sh.valid, 1e-6)
    sub = R // NL
    idx = np.clip(np.arange(NL + 1) * sub, 0, R - 1)
    pm = (np.hypot(*np.meshgrid(np.arange(NL + 1) - NL / 2,
                                np.arange(NL + 1) - NL / 2))
          <= NL / 2 + 0.5).ravel()
    e_lgs, e_ngs, turb = [], [], []
    for s in range(10):
        scr = jnp.asarray(np.asarray(phase_screens.synthesize_screen(
            500 + s, atm_h, 192, pitch, oversample=1)))
        ph_cone = np.array(relay.project_layers(
            [scr], [pitch], tel.diameter / 2, atm_h.altitudes, R,
            source_height=H))
        ph_sci = np.array(relay.project_layers(
            [scr], [pitch], tel.diameter / 2, atm_h.altitudes, R))
        slopes = np.asarray(wfs.geometric_slopes(
            sh, jnp.asarray(ph_cone - ph_cone.mean(), jnp.float32)))
        truth = (ph_sci - ph_sci.mean())[np.ix_(idx, idx)].ravel()
        rec_l = np.asarray(slopes_mmse.reconstruct_lgs(
            m_lgs, jnp.asarray(slopes, jnp.float32), pitch)).ravel()
        rec_n = np.asarray(slopes_mmse.reconstruct(
            m_ngs, jnp.asarray(slopes, jnp.float32), pitch)).ravel()
        for est, acc in ((rec_l, e_lgs), (rec_n, e_ngs)):
            e = est[pm] - truth[pm]
            e -= e.mean()
            acc.append(np.sqrt((e ** 2).mean()))
        turb.append(truth[pm].std())
    assert np.mean(e_lgs) < 0.8 * np.mean(e_ngs), (np.mean(e_lgs),
                                                   np.mean(e_ngs))
    # and it is a useful reconstruction in absolute terms
    assert np.mean(e_lgs) < 0.4 * np.mean(turb)


def test_bilinear_interp_matrix():
    """gridtools.bilinear_interp_matrix (bilinearSplineInterpMat.m:
    83-131): identity on matching lattices, partition of unity inside,
    exact on affine functions."""
    from mpc_sensorlessao_tpu.utils import gridtools
    xo = np.arange(5.0)
    Yo, Xo = np.meshgrid(xo, xo, indexing="ij")
    H = gridtools.bilinear_interp_matrix(Xo, Yo, Xo, Yo, 1.0)
    assert np.allclose(H, np.eye(25))
    xi = np.linspace(0.3, 3.7, 7)
    Yi, Xi = np.meshgrid(xi, xi, indexing="ij")
    H = gridtools.bilinear_interp_matrix(Xi, Yi, Xo, Yo, 1.0)
    assert np.allclose(H.sum(axis=1), 1.0)
    z = 2.0 * Xo + 3.0 * Yo - 1.0
    zi = H @ z.ravel()
    assert np.allclose(zi, (2.0 * Xi + 3.0 * Yi - 1.0).ravel(), atol=1e-12)
