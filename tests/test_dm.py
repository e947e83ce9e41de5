"""DM influence model: geometry, projection quality, voltage conversion."""

import numpy as np
import jax.numpy as jnp

from mpc_sensorlessao_tpu.models import dm
from mpc_sensorlessao_tpu.ops import zernike
from mpc_sensorlessao_tpu.utils.config import DMConfig, EstimatorConfig


def test_grid_geometry_matches_reference_at_512():
    cfg = DMConfig()
    len_dm, xaxis, centers = dm._dm_grid_axes(cfg, cfg.pixel_pitch)
    # README.md:206: len_dm = round(2.2e-3*2/6.5e-6) = 677
    assert len_dm == 677
    # actuator center indices 0,61,...,671 then last -> 676 (README.md:212-217)
    assert centers[0] == xaxis[0] and centers[-1] == xaxis[676]
    assert np.isclose(centers[1] - centers[0], 61 * cfg.pixel_pitch)


def test_influence_matrix_shapes_and_symmetry():
    basis = zernike.make_basis(6, 128)
    model = dm.build(DMConfig(), basis)
    assert model.influence.shape == (27, 144)
    assert model.influence_full.shape == (28, 144)
    B = np.asarray(model.influence_full, dtype=np.float64)
    # center 4 actuators are symmetric -> equal piston response
    k = np.abs(B[0]).argsort()[::-1][:4]
    assert np.std(B[0, k]) / np.abs(B[0, k]).mean() < 0.05


def test_influence_projection_equals_direct_ls_fit():
    """The full-square projection (README.md:271) must equal the masked LS
    fit (zernmodfit semantics): the basis vanishes outside the disc, so
    both solve the same normal equations."""
    basis = zernike.make_basis(6, 128)
    cfg = DMConfig()
    pitch = cfg.pixel_pitch * 512.0 / 128
    maps = dm.influence_maps_pupil(cfg, 128, pitch)
    model = dm.build(cfg, basis)
    k = 5 * 12 + 5  # central actuator
    direct = np.asarray(zernike.fit(
        basis, jnp.asarray(maps[k], dtype=jnp.float32)))
    proj = np.asarray(model.influence_full[:, k])
    np.testing.assert_allclose(proj, direct, atol=5e-3)


def test_rad_to_volts_inverse_quadratic():
    cfg = DMConfig()
    est = EstimatorConfig()
    u = jnp.asarray([-28.0, -1.0, 0.0, 1.0, 28.0])
    v = np.asarray(dm.rad_to_volts(u, cfg.coeff_a, cfg.coeff_b,
                                   est.rad_to_nm))
    # forward map: nm = a V^2 + b V (positive branch) must invert
    a, b = cfg.coeff_a, cfg.coeff_b
    nm = np.asarray(u) * est.rad_to_nm
    np.testing.assert_allclose(a * v**2 * np.sign(np.asarray(u)) + b * v, nm,
                               rtol=1e-5, atol=1e-3)
    # reference anchor: 28 rad ~ 200 V (README.md:353)
    assert 190 < v[-1] < 210, v[-1]
    assert np.allclose(v[0], -v[-1])


def test_apply_correction_batched():
    basis = zernike.make_basis(6, 64)
    model = dm.build(DMConfig(), basis)
    u = jnp.ones((4, 144))
    ad = dm.apply_correction(model, u)
    assert ad.shape == (4, 27)


def test_bezier_influence_functions():
    """OOMAO influenceFunction capability (influenceFunction.m:49-119):
    profile(0)=1, profile(1 pitch)=coupling, correct preset shapes."""
    import dataclasses
    from mpc_sensorlessao_tpu.models.dm import bezier_profile
    for preset in ("monotonic", "overshoot"):
        f, support = bezier_profile(0.25, preset)
        assert abs(f(0.0) - 1.0) < 1e-9
        assert abs(f(1.0) - 0.25) < 1e-4          # coupling anchor
        assert f(support + 0.1) == 0.0            # compact support
        assert abs(f(-0.7) - f(0.7)) < 1e-9       # even symmetry
    f_m, _ = bezier_profile(0.25, "monotonic")
    r = np.linspace(0, 1.8, 80)
    vm = f_m(r)
    assert (np.diff(vm) < 1e-6).all()             # monotone decreasing
    f_o, _ = bezier_profile(0.25, "overshoot")
    assert f_o(r).min() < -1e-3                   # negative overshoot

    import pytest
    with pytest.raises(ValueError):
        bezier_profile(0.2, "wat")


def test_bezier_dm_builds_and_spans():
    import dataclasses
    from mpc_sensorlessao_tpu.utils.config import DMConfig
    basis = zernike.make_basis(4, 64)
    for preset in ("bezier_monotonic", "bezier_overshoot"):
        cfg = DMConfig(influence=preset)
        model = dm.build(cfg, basis)
        B = np.asarray(model.influence)
        assert B.shape == (14, 144)
        # low-order modes well within reach: a tilt fit is near-exact
        x = np.zeros(14); x[0] = 1.0
        u, *_ = np.linalg.lstsq(B, x, rcond=None)
        assert np.linalg.norm(B @ u - x) < 1e-3
