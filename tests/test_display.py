"""Display helpers (utils/display.py): headless figure construction +
file output for the reference's MATLAB display surface equivalents."""

import os

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg", force=True)

from mpc_sensorlessao_tpu.models.closed_loop import StepOutputs
from mpc_sensorlessao_tpu.utils import display


def test_show_phase_masks_outside(tmp_path):
    rng = np.random.default_rng(0)
    ph = rng.normal(size=(32, 32))
    mask = np.hypot(*np.meshgrid(*[np.arange(32) - 15.5] * 2)) < 14
    out = os.path.join(tmp_path, "phase.png")
    fig = display.show_phase(ph, mask, save=out)
    assert os.path.exists(out) and os.path.getsize(out) > 0
    # masked pixels are NaN in the drawn array
    arr = fig.axes[0].images[0].get_array()
    assert np.isnan(np.asarray(arr)[~mask]).all()


def test_show_psf_log_stretch(tmp_path):
    img = np.zeros((31, 31))
    img[15, 15] = 1.0
    out = os.path.join(tmp_path, "psf.png")
    display.show_psf(img, save=out)
    assert os.path.getsize(out) > 0


def test_show_telemetry(tmp_path):
    T, nu, nx = 12, 4, 3
    z = np.zeros((T, nu), np.float32)
    o = StepOutputs(
        u=z, du=z, volts=z, x_est=np.zeros((T, nx), np.float32),
        x_est_norm=np.zeros(T), x_pred_norm=np.zeros(T),
        cost=np.zeros(T), rms_res=0.2 * np.ones(T),
        rms_turb=0.5 * np.ones(T), strehl=0.9 * np.ones(T),
        strehl_exact=0.95 * np.ones(T))
    out = os.path.join(tmp_path, "telemetry.png")
    fig = display.show_telemetry(o, save=out)
    assert len(fig.axes) == 3
    assert os.path.getsize(out) > 0


def test_polar_surface(tmp_path):
    rng = np.random.default_rng(1)
    th = rng.uniform(0, 2 * np.pi, 50)
    rho = rng.uniform(0, 1, 50)
    z = np.cos(th) * rho
    out = os.path.join(tmp_path, "polar.png")
    display.polar_surface(th, rho, z, n_grid=32, save=out)
    assert os.path.getsize(out) > 0
