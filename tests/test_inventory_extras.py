"""Inventory-completeness components: photometry, geninv, screen-synthesis
variants, failure guards."""

import numpy as np
import jax.numpy as jnp

from mpc_sensorlessao_tpu.models import solvers
from mpc_sensorlessao_tpu.ops import phase_screens, phase_stats
from mpc_sensorlessao_tpu.utils import guards, photometry
from mpc_sensorlessao_tpu.utils.config import AtmosphereConfig


def test_photometry_v_band():
    # photometry.m:50: V = (0.550e-6, 0.090e-6, 3.3e12)
    v = photometry.band("V")
    assert v.wavelength == 0.550e-6
    assert v.zero_point == 3.3e12
    assert np.isclose(v.n_photon(0.0), 3.3e12)
    assert np.isclose(v.n_photon(5.0), 3.3e12 * 10 ** (-2.0))
    assert 0 < photometry.wavelength_scale(photometry.V, photometry.K) < 1


def test_geninv_matches_pinv():
    rng = np.random.default_rng(0)
    for shape in [(8, 5), (5, 8), (6, 6)]:
        G = jnp.asarray(rng.normal(size=shape), jnp.float32)
        Y = np.asarray(solvers.geninv(G), dtype=np.float64)
        ref = np.linalg.pinv(np.asarray(G, dtype=np.float64))
        np.testing.assert_allclose(Y, ref, atol=2e-4)


ATM1 = AtmosphereConfig(fractional_r0=(1.0,), altitudes=(0.0,),
                        wind_speeds=(5.0,), wind_directions=(0.0,))


def test_straight_screen_statistics():
    scr = np.stack([np.asarray(phase_screens.synthesize_screen(
        s, ATM1, 16, 1 / 31, oversample=4, method="straight"))
        for s in range(40)])
    assert scr.shape == (40, 64, 64)
    d_emp = np.mean((scr[:, :, 8:] - scr[:, :, :-8]) ** 2)
    d_th = phase_stats.structure_function(8 / 31, ATM1, np)
    assert abs(d_emp - d_th) / d_th < 0.5, (d_emp, d_th)


def test_cholesky_screen_statistics():
    """Exact covariance sampling: tight structure-function agreement."""
    scr = np.stack([np.asarray(phase_screens.synthesize_screen(
        s, ATM1, 12, 1 / 23, oversample=2, method="cholesky"))
        for s in range(40)])
    assert scr.shape == (40, 24, 24)
    for sep in (4, 10):
        d_emp = np.mean((scr[:, :, sep:] - scr[:, :, :-sep]) ** 2)
        d_th = phase_stats.structure_function(sep / 23, ATM1, np)
        assert abs(d_emp - d_th) / d_th < 0.3, (sep, d_emp, d_th)


def test_guards_detect_issues():
    from mpc_sensorlessao_tpu.models.closed_loop import StepOutputs
    T = 10
    good = StepOutputs(
        u=jnp.ones((T, 4)), du=jnp.ones((T, 4)) * 0.1,
        volts=jnp.ones((T, 4)), x_est=jnp.ones((T, 3)),
        x_est_norm=jnp.ones(T), x_pred_norm=jnp.ones(T),
        cost=jnp.ones(T), rms_res=jnp.full(T, 0.1),
        rms_turb=jnp.full(T, 0.5), strehl=jnp.full(T, 0.99))
    assert guards.check_outputs(good, u_max=28.0).ok

    bad = good._replace(rms_res=jnp.full(T, 5.0))
    rep = guards.check_outputs(bad)
    assert not rep.ok and "diverged" in str(rep)

    nan = good._replace(cost=jnp.full(T, jnp.nan))
    assert not guards.check_outputs(nan).ok

    box = good._replace(u=jnp.full((T, 4), 100.0))
    assert not guards.check_outputs(box, u_max=28.0).ok
