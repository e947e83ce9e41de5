"""Constant-slack fixed-Newton operator path vs the general solver."""

import numpy as np
import jax
import jax.numpy as jnp

from mpc_sensorlessao_tpu.models import solvers
from mpc_sensorlessao_tpu.ops import newton_kkt


def _prob(seed=0, n=3, m=2):
    rng = np.random.default_rng(seed)
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    A1 = f32(0.5 * np.eye(n) + 0.1 * rng.normal(size=(n, n)))
    A2 = f32(0.15 * np.eye(n) + 0.05 * rng.normal(size=(n, n)))
    B = f32(rng.normal(size=(n, m)))
    return solvers.make_fastmpc_problem(A1, A2, B, 10.0, 10.0, 1.0, 2.0,
                                        barrier_k=1e-2), n, m


def test_fixed_operator_equals_general_single_step():
    prob, n, m = _prob()
    T = 3
    op = newton_kkt.precompute_fixed_newton(prob, T)
    rng = np.random.default_rng(1)
    for seed in range(5):
        r = np.random.default_rng(seed)
        x0 = jnp.asarray(r.normal(size=n) * 0.5, jnp.float32)
        x0p = jnp.asarray(r.normal(size=n) * 0.5, jnp.float32)
        w = jnp.asarray(r.normal(size=T * n) * 0.3, jnp.float32)
        s1 = newton_kkt.solve(prob, x0, x0p, w, horizon=T, n_newton=1)
        s2 = newton_kkt.solve_fixed(prob, op, x0, x0p, w, horizon=T)
        np.testing.assert_allclose(np.asarray(s2.U), np.asarray(s1.U),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s2.X), np.asarray(s1.X),
                                   rtol=1e-4, atol=1e-4)


def test_fixed_operator_vmapped():
    prob, n, m = _prob(seed=2)
    T = 2
    op = newton_kkt.precompute_fixed_newton(prob, T)
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.normal(size=(32, n)), jnp.float32)
    x0p = jnp.asarray(rng.normal(size=(32, n)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(32, T * n)) * 0.2, jnp.float32)
    f = jax.jit(jax.vmap(lambda a, b, c: newton_kkt.solve_fixed(
        prob, op, a, b, c, horizon=T).U))
    U = f(x0, x0p, w)
    assert U.shape == (32, T, m)
    single = newton_kkt.solve_fixed(prob, op, x0[5], x0p[5], w[5], horizon=T)
    np.testing.assert_allclose(np.asarray(U[5]), np.asarray(single.U),
                               rtol=1e-5, atol=1e-6)


def test_fixed_operator_respects_box_on_large_disturbance():
    prob, n, m = _prob(seed=4)
    T = 2
    op = newton_kkt.precompute_fixed_newton(prob, T)
    w = jnp.full((T * n,), 30.0)
    s = newton_kkt.solve_fixed(prob, op, jnp.zeros(n), jnp.zeros(n), w,
                               horizon=T)
    U = np.asarray(s.U)
    assert np.all(np.abs(U) <= 2.0), U  # line search keeps strict interior
