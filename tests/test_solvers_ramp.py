"""Ramp-constrained (VAR_1-style) structured solver vs dense oracle."""

import numpy as np
import scipy.optimize as sopt
import jax.numpy as jnp

from mpc_sensorlessao_tpu.models import solvers
from mpc_sensorlessao_tpu.ops import newton_kkt


def _ramp_problem(seed=0, n=3, m=2, T=3, k=1e-2, du=0.4):
    rng = np.random.default_rng(seed)
    A1 = 0.5 * np.eye(n) + 0.1 * rng.normal(size=(n, n))
    A2 = 0.15 * np.eye(n) + 0.05 * rng.normal(size=(n, n))
    B = rng.normal(size=(n, m))
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    u_prev = f32(rng.uniform(-0.5, 0.5, m))
    prob = solvers.make_fastmpc_problem(
        f32(A1), f32(A2), f32(B), q_weight=10.0, p_weight=10.0,
        r_weight=1.0, u_max=2.0, barrier_k=k, du_max=du, u_prev=u_prev)
    x0 = f32(rng.normal(size=n) * 0.5)
    x0_pre = f32(rng.normal(size=n) * 0.5)
    w = f32(rng.normal(size=T * n) * 0.3)
    return prob, x0, x0_pre, w, T, n, m


def _dense(prob, x0, x0_pre, w, T):
    n, m = prob.B.shape
    return solvers.assemble_dense(
        jnp.diag(prob.q_diag), jnp.diag(prob.r_diag), jnp.diag(prob.qf_diag),
        prob.A1, prob.A2, prob.B, w, x0, x0_pre, prob.u_prev,
        prob.u_min, prob.u_max, prob.du_min, prob.du_max,
        horizon=T, ramp=True, barrier_k=float(prob.barrier_k))


def test_ramp_structured_matches_dense():
    prob, x0, x0_pre, w, T, n, m = _ramp_problem()
    state = newton_kkt.solve(prob, x0, x0_pre, w, horizon=T, n_newton=6,
                             ramp=True)
    dp = _dense(prob, x0, x0_pre, w, T)
    z = solvers.dense_newton_solve(dp, n_newton=6)
    U_d, _ = solvers.unpack_controls(z, n, m, T)
    np.testing.assert_allclose(np.asarray(state.U), np.asarray(U_d),
                               rtol=2e-3, atol=2e-3)


def test_ramp_constraints_active_and_respected():
    prob, x0, x0_pre, w, T, n, m = _ramp_problem(seed=5, du=0.1)
    w = w * 20.0  # large disturbance -> ramp binds
    state = newton_kkt.solve(prob, x0, x0_pre, w, horizon=T, n_newton=15,
                             ramp=True)
    U = np.asarray(state.U)
    u_prev = np.asarray(prob.u_prev)
    dU = np.diff(np.vstack([u_prev, U]), axis=0)
    assert np.all(np.abs(dU) <= 0.1 + 1e-5), dU
    # the bound is actually active somewhere for this disturbance
    assert np.abs(dU).max() > 0.09


def test_ramp_barrier_optimum_vs_scipy():
    prob, x0, x0_pre, w, T, n, m = _ramp_problem(seed=7)
    state = newton_kkt.solve(prob, x0, x0_pre, w, horizon=T, n_newton=30,
                             ramp=True)
    dp = _dense(prob, x0, x0_pre, w, T)
    H = np.asarray(dp.H, dtype=np.float64)
    g = np.asarray(dp.g, dtype=np.float64)
    P = np.asarray(dp.P, dtype=np.float64)
    h = np.asarray(dp.h, dtype=np.float64)
    C = np.asarray(dp.C, dtype=np.float64)
    b = np.asarray(dp.b, dtype=np.float64)
    k = float(dp.barrier_k)

    def f(z):
        s = h - P @ z
        if np.any(s <= 0):
            return 1e10
        return z @ H @ z + g @ z - k * np.sum(np.log(s))

    res = sopt.minimize(
        f, np.asarray(dp.z_init, dtype=np.float64),
        constraints=[{"type": "eq", "fun": lambda z: C @ z - b}],
        method="SLSQP", options={"maxiter": 800, "ftol": 1e-12})
    assert res.success, res.message
    U_ref, _ = solvers.unpack_controls(
        jnp.asarray(res.x, jnp.float32), n, m, T)
    np.testing.assert_allclose(np.asarray(state.U), np.asarray(U_ref),
                               rtol=5e-3, atol=5e-3)
