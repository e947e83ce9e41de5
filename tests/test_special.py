"""utils.special K_nu against scipy (test-only oracle)."""

import numpy as np
import scipy.special as sps

from mpc_sensorlessao_tpu.utils.special import kv_frac


def test_kv56_matches_scipy_across_range():
    x = np.concatenate([
        np.geomspace(1e-4, 7.9, 200),
        np.linspace(8.0, 60.0, 100),
    ])
    ours = kv_frac(5.0 / 6.0, x, np)
    ref = sps.kv(5.0 / 6.0, x)
    rel = np.abs(ours - ref) / np.abs(ref)
    assert np.max(rel) < 5e-7, np.max(rel)


def test_kv_other_fractional_orders():
    for nu in (1.0 / 6.0, 1.0 / 3.0, 11.0 / 12.0):
        x = np.geomspace(1e-3, 40.0, 150)
        rel = np.abs(kv_frac(nu, x, np) - sps.kv(nu, x)) / np.abs(sps.kv(nu, x))
        assert np.max(rel) < 1e-6, (nu, np.max(rel))
