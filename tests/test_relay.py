"""Source geometry + relay projection (source.m LGS/off-axis branches)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from mpc_sensorlessao_tpu.ops import relay


def test_direction_vector():
    arcsec = math.pi / 180 / 3600
    dx, dy = relay.direction_vector(10 * arcsec, math.pi / 2)
    assert dx == pytest.approx(0.0, abs=1e-12)
    assert dy == pytest.approx(math.tan(10 * arcsec))


def make_ramp(n, pitch):
    """Screen phi(x, y) = x [m] -> exact under bilinear interpolation."""
    half = (n - 1) / 2
    x = (np.arange(n) - half) * pitch
    return jnp.asarray(np.tile(x, (n, 1)), jnp.float32), x


def test_on_axis_ngs_identity():
    """h=0, on-axis NGS: projection reproduces the pupil cut exactly."""
    screen, x = make_ramp(65, 0.05)
    R, res = 0.5, 33
    out = relay.project_layers([screen], [0.05], R, [0.0], res)
    expect = np.tile(np.linspace(-R, R, res), (res, 1))
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_off_axis_shift():
    """A layer at altitude h seen off-axis is shifted by h*theta
    (telescopeAbstract.m:474-477)."""
    screen, _ = make_ramp(129, 0.05)
    R, res, h = 0.5, 17, 5000.0
    theta = 2e-4 / 5000.0 * 2          # shift = h*theta = 2e-4*2 = 4e-4... keep small
    theta = 0.2 / h                     # shift = 0.2 m
    out = relay.project_layers([screen], [0.05], R, [h], res,
                               direction=(theta, 0.0))
    expect = np.tile(np.linspace(-R, R, res) + 0.2, (res, 1))
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_lgs_cone_compression():
    """LGS at H: footprint on a layer at h shrinks by (1-h/H)
    (telescopeAbstract.m:472)."""
    screen, _ = make_ramp(129, 0.05)
    R, res, h, H = 0.5, 17, 10e3, 90e3
    out = relay.project_layers([screen], [0.05], R, [h], res,
                               source_height=H)
    shrink = 1.0 - h / H
    assert relay.cone_compression(h, H) == pytest.approx(shrink)
    expect = np.tile(np.linspace(-R, R, res) * shrink, (res, 1))
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)
    assert relay.cone_compression(h, math.inf) == 1.0


def test_multi_layer_sum_and_scales():
    """Layers add; wavelength ratio and airmass scale the result
    (telescopeAbstract.m:490-492)."""
    s1, _ = make_ramp(65, 0.05)
    s2, _ = make_ramp(97, 0.04)
    R, res = 0.5, 9
    za = 0.5
    out = relay.project_layers(
        [s1, s2], [0.05, 0.04], R, [0.0, 0.0], res,
        wavelength_ratio=550 / 589, zenith_angle=za)
    base = np.tile(np.linspace(-R, R, res), (res, 1)) * 2
    expect = base * (550 / 589) / math.sqrt(math.cos(za))
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_out_of_bounds_footprint_raises():
    """A footprint that leaves the layer screen must fail loudly at
    setup (the reference's interp2 would NaN) instead of extrapolating."""
    screen, _ = make_ramp(33, 0.05)          # half-extent 0.8 m
    with pytest.raises(ValueError, match="footprint"):
        relay.project_layers([screen], [0.05], 0.5, [5000.0], 9,
                             direction=(1e-4, 0.0))  # offset 0.5 m -> reach 1.0


def test_bilinear_clamps_not_extrapolates():
    """Sampling past the border holds the edge value (bounded), never
    linearly extrapolates."""
    screen, x = make_ramp(17, 1.0)
    out = relay._bilinear(screen, jnp.asarray([[8.0]]), jnp.asarray([[30.0]]))
    assert float(out[0, 0]) == pytest.approx(float(x[-1]))
