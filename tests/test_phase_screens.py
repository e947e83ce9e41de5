"""Phase-screen statistics vs Von Karman analytics (the validation the
reference leaves commented out, atmosphere.m:461-467)."""

import numpy as np
import jax
import jax.numpy as jnp

from mpc_sensorlessao_tpu.ops import phase_screens, phase_stats
from mpc_sensorlessao_tpu.utils.config import AtmosphereConfig, TelescopeConfig

# strong single layer for good statistics
ATM1 = AtmosphereConfig(fractional_r0=(1.0,), altitudes=(1000.0,),
                        wind_speeds=(5.0,), wind_directions=(0.3,))
TEL = TelescopeConfig(resolution=32)


def _many_screens(n, res=32, os=4, sub=3):
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    return np.stack([np.asarray(phase_screens.synthesize_screen(
        k, ATM1, res, TEL.diameter / (res - 1), oversample=os,
        subharmonic_levels=sub)) for k in keys])


def test_screen_psd_matches_spectrum():
    """Ensemble PSD of synthesized screens ~ phaseStats.spectrum."""
    res, os = 32, 4
    pitch = TEL.diameter / (res - 1)
    scr = _many_screens(60, res, os, sub=0)
    N = scr.shape[-1]
    df = 1.0 / (N * pitch)
    # screen = df * sum_k sqrt(PSD_k) c_k e^{2pi i kx/N}, E|c_k|^2 = 1
    # => E|fft2(screen)/N^2|^2 = df^2 PSD_k
    F = np.fft.fft2(scr) / N ** 2
    emp = np.mean(np.abs(F) ** 2, axis=0)
    fx = np.fft.fftfreq(N, d=pitch)
    fr = np.hypot(fx[:, None], fx[None, :])
    theory = phase_stats.spectrum(fr, ATM1, np) * df ** 2
    # compare on a mid-frequency annulus (away from DC and Nyquist)
    sel = (fr > 5 * df) & (fr < 0.25 / pitch)
    ratio = emp[sel] / theory[sel]
    assert abs(np.mean(ratio) - 1.0) < 0.15, np.mean(ratio)


def test_structure_function_matches_analytic():
    res = 32
    pitch = TEL.diameter / (res - 1)
    scr = _many_screens(150, res, 4, 3)
    win = scr[:, :res, :res]
    seps = [2, 5, 10, 20]
    for s in seps:
        d_emp = np.mean((win[:, :, s:] - win[:, :, :-s]) ** 2)
        d_th = phase_stats.structure_function(s * pitch, ATM1, np)
        rel = abs(d_emp - d_th) / d_th
        assert rel < 0.25, (s, d_emp, d_th)


def test_subharmonics_add_low_frequency_power():
    scr0 = _many_screens(40, 32, 4, 0)
    scr3 = _many_screens(40, 32, 4, 3)
    # screen-to-screen variance of the window mean (piston power) must grow
    pist0 = np.var(scr0.mean(axis=(1, 2)))
    pist3 = np.var(scr3.mean(axis=(1, 2)))
    assert pist3 > 2.0 * pist0, (pist0, pist3)


def test_frozen_flow_integer_shift_is_roll():
    key = jax.random.PRNGKey(1)
    atm = AtmosphereConfig(
        fractional_r0=(1.0,), altitudes=(0.0,),
        wind_speeds=(TEL.pixel_pitch * TEL.sampling_freq,),  # 1 px/step
        wind_directions=(0.0,))
    layers = phase_screens.make_layers(key, atm, TEL)
    np.testing.assert_allclose(np.asarray(layers.step_px), [[0.0, 1.0]],
                               atol=1e-6)
    p0 = np.asarray(phase_screens.phase_at(layers, 0, TEL.resolution))
    p3 = np.asarray(phase_screens.phase_at(layers, 3, TEL.resolution))
    scr = np.asarray(layers.screens[0])
    np.testing.assert_allclose(p0, scr[:32, :32], atol=1e-6)
    np.testing.assert_allclose(p3, np.roll(scr, -3, axis=1)[:32, :32],
                               atol=1e-5)


def test_frozen_flow_fractional_shift_interpolates():
    key = jax.random.PRNGKey(2)
    atm = AtmosphereConfig(
        fractional_r0=(1.0,), altitudes=(0.0,),
        wind_speeds=(0.5 * TEL.pixel_pitch * TEL.sampling_freq,),
        wind_directions=(0.0,))
    layers = phase_screens.make_layers(key, atm, TEL)
    p1 = np.asarray(phase_screens.phase_at(layers, 1, TEL.resolution))
    scr = np.asarray(layers.screens[0])
    expected = 0.5 * scr[:32, :32] + 0.5 * np.roll(scr, -1, axis=1)[:32, :32]
    np.testing.assert_allclose(p1, expected, atol=1e-5)


def test_multi_layer_sum_and_shapes():
    layers = phase_screens.make_layers(
        jax.random.PRNGKey(3), AtmosphereConfig(), TEL)
    # 4x oversampled screens, wrap-padded by the window size (32+1)
    assert layers.screens.shape == (3, 128 + 33, 128 + 33)
    ph = phase_screens.phase_at(layers, 17.5, 32)
    assert ph.shape == (32, 32)
    assert np.isfinite(np.asarray(ph)).all()
