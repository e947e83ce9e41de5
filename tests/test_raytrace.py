"""Paraxial ABCD ray tracing (+rayTracing package equivalents)."""

import math

import numpy as np
import jax.numpy as jnp

from mpc_sensorlessao_tpu.ops import raytrace as rt


def test_thin_lens_focuses_collimated_beam():
    f = 0.5
    sys = [rt.thin_lens(f), rt.free_space(f)]
    rays = jnp.stack([jnp.linspace(-0.01, 0.01, 101),
                      jnp.zeros(101)], axis=-1)
    out, ok, z, zdir = rt.trace(sys, rays)
    assert np.abs(np.asarray(out[:, 0])).max() < 1e-8   # focus point
    assert z == f and zdir == 1 and bool(ok.all())


def test_4f_relay_and_effective_focal_length():
    f1, f2 = 0.2, 0.4
    sys = [rt.free_space(f1), rt.thin_lens(f1), rt.free_space(f1 + f2),
           rt.thin_lens(f2), rt.free_space(f2)]
    M = rt.system_matrix(sys)
    # 4f: imaging with magnification -f2/f1, zero C term
    assert abs(M[0, 0] + f2 / f1) < 1e-5
    assert abs(M[1, 0]) < 1e-5
    assert abs(rt.effective_focal_length(sys)) > 1e4
    # telephoto: two lenses at distance d
    d = 0.1
    tele = [rt.thin_lens(f1), rt.free_space(d), rt.thin_lens(f2)]
    eff = rt.effective_focal_length(tele)
    expect = 1.0 / (1 / f1 + 1 / f2 - d / (f1 * f2))
    assert abs(eff - expect) < 1e-4 * abs(expect)


def test_curved_mirror_direction_offset_and_stop():
    R = 1.0
    m = rt.curved_mirror(R, offset=0.002, stop_width=0.05)
    rays = jnp.asarray([[0.002, 0.0],    # hits mirror vertex (decentered)
                        [0.012, 0.0],    # 1 cm off vertex
                        [0.2, 0.0]])     # outside the 5 cm stop
    out, ok = rt.apply(m, rays)
    # vertex ray: unchanged angle; off-vertex: angle = -2 y / R
    assert abs(float(out[0, 1])) < 1e-9
    assert abs(float(out[1, 1]) + 2 * 0.01 / R) < 1e-9
    assert bool(ok[0]) and bool(ok[1]) and not bool(ok[2])
    _, _, _, zdir = rt.trace([m], rays)
    assert zdir == -1
