"""Spatial-frequency AO error budget (fourierAdaptiveOptics.m analytics)."""

import dataclasses
import math

import numpy as np
import pytest

from mpc_sensorlessao_tpu.ops import fourier_ao, phase_stats
from mpc_sensorlessao_tpu.utils.config import AtmosphereConfig

ATM = AtmosphereConfig()


def make_cfg(**kw):
    base = dict(diameter=1.0, atm=ATM, n_actuator=12, noise_variance=0.0,
                loop_gain=0.5, exposure_time=1 / 200.0, latency=1 / 200.0)
    base.update(kw)
    return fourier_ao.FourierAOConfig(**base)


def grid(cfg, n=128, span=3.0):
    g = np.linspace(-span * cfg.fc, span * cfg.fc, n)
    return np.meshgrid(g, g)


def test_cutoff_frequency():
    cfg = make_cfg()
    assert cfg.fc == pytest.approx(0.5 * 11 / 1.0)  # (nAct-1)/2D


def test_piston_filter_limits():
    cfg = make_cfg()
    pf = fourier_ao.piston_filter(cfg, np.array([0.0, 50.0, 500.0]))
    assert pf[0] == pytest.approx(0.0, abs=1e-12)   # DC killed
    assert 0.9 < pf[2] <= 1.0                        # high-f passes
    assert np.all((pf >= 0) & (pf <= 1.0 + 1e-9))


def test_fitting_psd_support():
    """Fitting power lives strictly outside the correction box
    (fourierAdaptiveOptics.m:64-68)."""
    cfg = make_cfg()
    fx, fy = grid(cfg)
    psd = fourier_ao.fitting_psd(cfg, fx, fy)
    inside = (np.abs(fx) <= cfg.fc) & (np.abs(fy) <= cfg.fc)
    assert np.all(psd[inside] == 0)
    assert np.all(psd >= 0) and psd[~inside].max() > 0


def test_servo_noise_aliasing_support():
    """Servo/noise/aliasing power lives inside the box."""
    cfg = make_cfg(noise_variance=0.1)
    fx, fy = grid(cfg)
    outside = (np.abs(fx) > cfg.fc) | (np.abs(fy) > cfg.fc)
    for fun in (fourier_ao.servo_lag_psd, fourier_ao.noise_psd,
                fourier_ao.aliasing_psd):
        psd = fun(cfg, fx, fy)
        assert np.all(psd[outside] == 0), fun.__name__
        assert np.all(psd >= 0) and psd.max() > 0, fun.__name__


def test_noise_psd_linear_in_variance():
    cfg1 = make_cfg(noise_variance=0.05)
    cfg2 = make_cfg(noise_variance=0.10)
    fx, fy = grid(cfg1, n=64)
    np.testing.assert_allclose(fourier_ao.noise_psd(cfg2, fx, fy),
                               2.0 * fourier_ao.noise_psd(cfg1, fx, fy),
                               rtol=1e-10)


def test_var_fitting_decreases_with_actuators():
    v = [fourier_ao.var_fitting(make_cfg(n_actuator=n))
         for n in (8, 12, 20)]
    assert v[0] > v[1] > v[2] > 0


def test_var_fitting_matches_psd_quadrature():
    """var_fitting (analytic total minus in-box) must agree with direct
    integration of fittingPSD over a wide domain."""
    cfg = make_cfg(n_actuator=12)
    n, span = 1200, 40.0
    g = np.linspace(-span, span, n)
    fx, fy = np.meshgrid(g, g)
    f = np.hypot(fx, fy)
    raw = np.where((np.abs(fx) > cfg.fc) | (np.abs(fy) > cfg.fc),
                   phase_stats.spectrum(f, cfg.atm), 0.0)
    direct = np.trapezoid(np.trapezoid(raw, g, axis=1), g)
    # direct integration misses the tail beyond span and the piston
    # filter; agreement to ~10% validates the bookkeeping
    assert fourier_ao.var_fitting(cfg) == pytest.approx(direct, rel=0.1)


def test_rejection_tf_shape():
    """Integrator rejection: strong at low temporal frequency, ~1 at
    high frequency (fourierAdaptiveOptics.m:283-292)."""
    cfg = make_cfg(latency=0.0)
    lo = fourier_ao.closed_loop_rejection(cfg, np.array([0.05]))
    hi = fourier_ao.closed_loop_rejection(cfg, np.array([95.0]))
    assert lo[0] < 0.05          # low-f disturbance rejected
    assert 0.3 < hi[0] < 3.0     # near unity past loop bandwidth
    assert fourier_ao.closed_loop_rejection(cfg, np.array([0.0]))[0] == 0


def test_higher_gain_rejects_low_freq_better():
    nu = np.array([0.5])
    r_lo = fourier_ao.closed_loop_rejection(make_cfg(loop_gain=0.2), nu)
    r_hi = fourier_ao.closed_loop_rejection(make_cfg(loop_gain=0.6), nu)
    assert r_hi[0] < r_lo[0]


def test_anisoplanatism_grows_with_offset():
    cfg = make_cfg()
    fx, fy = grid(cfg, n=64)
    arcsec = math.pi / 180 / 3600
    v1 = fourier_ao.anisoplanatism_psd(cfg, fx, fy, (arcsec, 0.0)).sum()
    v2 = fourier_ao.anisoplanatism_psd(cfg, fx, fy, (10 * arcsec, 0.0)).sum()
    assert 0 < v1 < v2


def test_psf_strehl_tracks_turbulence_strength():
    weak = dataclasses.replace(ATM, r0=2.0)
    strong = dataclasses.replace(ATM, r0=0.1)
    s_weak = fourier_ao.psf(make_cfg(atm=weak), 64, 8.0)[1]
    s_strong = fourier_ao.psf(make_cfg(atm=strong), 64, 8.0)[1]
    assert 0 < s_strong < s_weak <= 1.0 + 1e-9


def test_psf_normalized_peak():
    """Near-diffraction-limited config: PSF peaks at center, Strehl ~1."""
    img, strehl = fourier_ao.psf(make_cfg(atm=dataclasses.replace(
        ATM, r0=5.0)), 64, 8.0)
    assert strehl > 0.95
    cy, cx = np.unravel_index(np.argmax(img), img.shape)
    assert abs(cy - 32) <= 1 and abs(cx - 32) <= 1
    assert np.all(np.isfinite(img))


def test_noise_tf_finite_at_frame_rate_harmonics():
    """red/sinc is 0/0 at nu = k/T in the reference; the analytic
    cancellation red/sinc = g/(2 pi nu T) must give the finite limit."""
    cfg = make_cfg(noise_variance=1.0)
    T = cfg.exposure_time
    for k in (1, 2, 5):
        v = fourier_ao.closed_loop_noise(cfg, np.asarray([k / T]))
        assert np.isfinite(v).all()
        # limit value: red -> 0 there, denominator -> 1
        expect = (cfg.loop_gain / (2 * np.pi * k)) ** 2
        np.testing.assert_allclose(v, expect, rtol=1e-12)
    # and epsilon-near the harmonic the TF is continuous
    eps = 1e-9 / T
    near = fourier_ao.closed_loop_noise(cfg, np.asarray([1 / T + eps]))
    at = fourier_ao.closed_loop_noise(cfg, np.asarray([1 / T]))
    np.testing.assert_allclose(near, at, rtol=1e-5)


def test_average_tf_uses_raw_fr0_weights():
    """averageRejection uses RAW fractionnalR0 weights
    (fourierAdaptiveOptics.m:336-344): doubling fr0 doubles the TF."""
    cfg1 = make_cfg()
    atm2 = dataclasses.replace(
        ATM, fractional_r0=tuple(2 * f for f in ATM.fractional_r0))
    cfg2 = make_cfg(atm=atm2)
    fx, fy = grid(cfg1, n=16)
    t1 = fourier_ao._average_tf(cfg1, fx, fy, fourier_ao.closed_loop_rejection)
    t2 = fourier_ao._average_tf(cfg2, fx, fy, fourier_ao.closed_loop_rejection)
    np.testing.assert_allclose(t2, 2.0 * t1, rtol=1e-12)
