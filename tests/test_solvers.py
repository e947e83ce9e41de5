"""Solver cross-validation: structured vs dense vs scipy oracle.

Follows the reference's own validation pattern -- multiple solvers on the
same problem (SURVEY.md section 4) -- but with actual tolerance checks.
"""

import numpy as np
import scipy.optimize as sopt
import jax
import jax.numpy as jnp

from mpc_sensorlessao_tpu.models import mpc, solvers
from mpc_sensorlessao_tpu.ops import newton_kkt


def _small_problem(seed=0, n=3, m=2, T=3, k=1e-2):
    rng = np.random.default_rng(seed)
    A1 = 0.5 * np.eye(n) + 0.1 * rng.normal(size=(n, n))
    A2 = 0.15 * np.eye(n) + 0.05 * rng.normal(size=(n, n))
    B = rng.normal(size=(n, m))
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    prob = solvers.make_fastmpc_problem(
        f32(A1), f32(A2), f32(B), q_weight=10.0, p_weight=10.0,
        r_weight=1.0, u_max=2.0, barrier_k=k)
    x0 = f32(rng.normal(size=n) * 0.5)
    x0_pre = f32(rng.normal(size=n) * 0.5)
    w = f32(rng.normal(size=T * n) * 0.1)
    return prob, x0, x0_pre, w, (A1, A2, B, T, n, m)


def _dense_from_structured(prob, x0, x0_pre, w, T, ramp=False,
                           u_prev=None, du=None):
    n, m = prob.B.shape
    Q = jnp.diag(prob.q_diag)
    Qf = jnp.diag(prob.qf_diag)
    R = jnp.diag(prob.r_diag)
    zeros = jnp.zeros((m,), dtype=prob.B.dtype)
    return solvers.assemble_dense(
        Q, R, Qf, prob.A1, prob.A2, prob.B, w, x0, x0_pre,
        u_prev if u_prev is not None else zeros,
        prob.u_min, prob.u_max,
        -du if du is not None else zeros, du if du is not None else zeros,
        horizon=T, ramp=ramp, barrier_k=float(prob.barrier_k))


def test_structured_matches_dense_one_newton_step():
    prob, x0, x0_pre, w, (A1, A2, B, T, n, m) = _small_problem()
    state = newton_kkt.solve(prob, x0, x0_pre, w, horizon=T, n_newton=1)
    dp = _dense_from_structured(prob, x0, x0_pre, w, T)
    z = solvers.dense_newton_solve(dp, n_newton=1)
    U_d, X_d = solvers.unpack_controls(z, n, m, T)
    np.testing.assert_allclose(np.asarray(state.U), np.asarray(U_d),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(state.X), np.asarray(X_d),
                               rtol=1e-4, atol=1e-4)


def test_structured_matches_dense_many_steps():
    prob, x0, x0_pre, w, (A1, A2, B, T, n, m) = _small_problem(seed=3)
    state = newton_kkt.solve(prob, x0, x0_pre, w, horizon=T, n_newton=8)
    dp = _dense_from_structured(prob, x0, x0_pre, w, T)
    z = solvers.dense_newton_solve(dp, n_newton=8)
    U_d, _ = solvers.unpack_controls(z, n, m, T)
    np.testing.assert_allclose(np.asarray(state.U), np.asarray(U_d),
                               rtol=1e-3, atol=1e-3)


def _scipy_barrier_qp(dp, T, n, m):
    """Equality-constrained barrier problem solved by scipy (float64)."""
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
        method="SLSQP", options={"maxiter": 500, "ftol": 1e-12})
    assert res.success, res.message
    return res.x


def test_newton_converges_to_scipy_barrier_optimum():
    prob, x0, x0_pre, w, (A1, A2, B, T, n, m) = _small_problem(seed=7)
    state = newton_kkt.solve(prob, x0, x0_pre, w, horizon=T, n_newton=30)
    dp = _dense_from_structured(prob, x0, x0_pre, w, T)
    z_ref = _scipy_barrier_qp(dp, T, n, m)
    U_ref, _ = solvers.unpack_controls(jnp.asarray(z_ref, jnp.float32), n, m, T)
    np.testing.assert_allclose(np.asarray(state.U), np.asarray(U_ref),
                               rtol=2e-3, atol=2e-3)


def test_solution_strictly_inside_box():
    prob, x0, x0_pre, w, (_, _, _, T, n, m) = _small_problem(seed=9)
    # large disturbance pushes u toward bounds
    w = w * 50.0
    state = newton_kkt.solve(prob, x0, x0_pre, w, horizon=T, n_newton=10)
    U = np.asarray(state.U)
    assert np.all(U < np.asarray(prob.u_max) + 1e-6)
    assert np.all(U > np.asarray(prob.u_min) - 1e-6)


def test_batched_solve_vmap():
    prob, x0, x0_pre, w, (A1, A2, B, T, n, m) = _small_problem()
    rng = np.random.default_rng(11)
    x0s = jnp.asarray(rng.normal(size=(16, n)) * 0.5, jnp.float32)
    x0ps = jnp.asarray(rng.normal(size=(16, n)) * 0.5, jnp.float32)
    ws = jnp.asarray(rng.normal(size=(16, T * n)) * 0.1, jnp.float32)
    batched = jax.vmap(
        lambda a, b_, c: newton_kkt.solve(prob, a, b_, c, horizon=T))
    states = batched(x0s, x0ps, ws)
    assert states.U.shape == (16, T, m)
    # row 0 matches the single solve
    single = newton_kkt.solve(prob, x0s[0], x0ps[0], ws[0], horizon=T)
    np.testing.assert_allclose(np.asarray(states.U[0]), np.asarray(single.U),
                               rtol=1e-5, atol=1e-5)


def test_admm_matches_scipy_on_condensed_qp():
    rng = np.random.default_rng(13)
    nx, nu, N = 3, 2, 3
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    A1 = 0.5 * np.eye(nx)
    A2 = 0.1 * np.eye(nx)
    B = rng.normal(size=(nx, nu))
    mats = mpc.design_matrices(f32(A1), f32(A2), f32(B), N,
                               f32(10 * np.eye(nx)), f32(10 * np.eye(nx)),
                               f32(np.eye(nu)))
    r = f32(rng.normal(size=N * nu) * 5)
    U_box = 0.8
    dU_box = 0.5
    U_min = jnp.full((N * nu,), -U_box)
    U_max = jnp.full((N * nu,), U_box)
    dU_min = jnp.full((N * nu,), -dU_box)
    dU_max = jnp.full((N * nu,), dU_box)
    U = solvers.admm_condensed(mats, r, U_min, U_max, dU_min, dU_max,
                               n_iter=500)

    H = np.asarray(mats.H, dtype=np.float64)
    E = np.asarray(mats.E, dtype=np.float64)
    rr = np.asarray(r, dtype=np.float64)
    res = sopt.minimize(
        lambda u: u @ H @ u + rr @ u, np.zeros(N * nu),
        constraints=[
            {"type": "ineq", "fun": lambda u: U_box - u},
            {"type": "ineq", "fun": lambda u: u + U_box},
            {"type": "ineq", "fun": lambda u: dU_box - E @ u},
            {"type": "ineq", "fun": lambda u: E @ u + dU_box},
        ], method="SLSQP", options={"maxiter": 500, "ftol": 1e-12})
    assert res.success
    np.testing.assert_allclose(np.asarray(U), res.x, atol=5e-3)


def test_closed_form_matches_unconstrained_newton():
    """With huge box bounds and tiny barrier the fastMPC first-stage input
    approaches the unconstrained condensed optimum."""
    rng = np.random.default_rng(17)
    n, m, T = 3, 2, 2
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    A1 = 0.4 * np.eye(n)
    A2 = 0.1 * np.eye(n)
    B = rng.normal(size=(n, m))
    prob = solvers.make_fastmpc_problem(
        f32(A1), f32(A2), f32(B), q_weight=10.0, p_weight=10.0, r_weight=1.0,
        u_max=1e3, barrier_k=1e-6)
    x0 = f32(rng.normal(size=n))
    x0_pre = f32(rng.normal(size=n))
    w = jnp.zeros(T * n)
    state = newton_kkt.solve(prob, x0, x0_pre, w, horizon=T, n_newton=40)

    # unconstrained stacked optimum via scipy on the dense problem (k->0)
    dp = _dense_from_structured(prob, x0, x0_pre, w, T)
    H = np.asarray(dp.H, dtype=np.float64)
    C = np.asarray(dp.C, dtype=np.float64)
    b = np.asarray(dp.b, dtype=np.float64)
    Z = H.shape[0]
    KKT = np.block([[2 * H, C.T], [C, np.zeros((C.shape[0], C.shape[0]))]])
    sol = np.linalg.solve(KKT, np.concatenate([np.zeros(Z), b]))
    U_ref, _ = solvers.unpack_controls(
        jnp.asarray(sol[:Z], jnp.float32), n, m, T)
    np.testing.assert_allclose(np.asarray(state.U), np.asarray(U_ref),
                               rtol=5e-3, atol=5e-3)


def test_admm_telemetry_and_adaptive_rho():
    """ADMM reports primal/dual residuals; at an ill-scaled operating
    point the adaptive-rho restarts tighten them; converged flag reflects
    tol.  (VERDICT: a user sweeping Q/R scales must be able to see
    non-convergence.)"""
    import dataclasses
    rng = np.random.default_rng(5)
    nx, nu, N = 6, 4, 2
    A1 = jnp.asarray(0.6 * np.eye(nx) + 0.05 * rng.normal(size=(nx, nx)),
                     jnp.float32)
    A2 = jnp.asarray(0.1 * np.eye(nx), jnp.float32)
    B = jnp.asarray(rng.normal(size=(nx, nu)), jnp.float32)
    # ill-scaled: huge Q, tiny R
    Q = jnp.asarray(1e5 * np.eye(nx), jnp.float32)
    R = jnp.asarray(1e-2 * np.eye(nu), jnp.float32)
    mats = mpc.design_matrices(A1, A2, B, N, Q, Q, R)
    r = jnp.asarray(rng.normal(size=(N * nu,)) * 1e3, jnp.float32)
    lo = jnp.full((N * nu,), -2.0); hi = jnp.full((N * nu,), 2.0)
    dlo = jnp.full((N * nu,), -0.5); dhi = jnp.full((N * nu,), 0.5)

    U1, info1 = solvers.admm_condensed(mats, r, lo, hi, dlo, dhi,
                                       n_iter=120, tol=1e-3,
                                       return_info=True)
    U2, info2 = solvers.admm_condensed(mats, r, lo, hi, dlo, dhi,
                                       n_iter=120, tol=1e-3,
                                       adapt_rounds=3, return_info=True)
    assert np.isfinite(float(info1.primal_rms))
    assert np.isfinite(float(info1.dual_rms))
    # adaptive restarts must not be worse on the dominant residual
    worst1 = max(float(info1.primal_rms), float(info1.dual_rms))
    worst2 = max(float(info2.primal_rms), float(info2.dual_rms))
    assert worst2 <= worst1 * 1.5
    # constraints honored
    assert float(jnp.max(jnp.abs(U2))) <= 2.0 + 1e-3
    # long run converges and the flag says so
    U3, info3 = solvers.admm_condensed(mats, r, lo, hi, dlo, dhi,
                                       n_iter=2000, tol=1e-3,
                                       adapt_rounds=3, return_info=True)
    assert bool(info3.converged), (float(info3.primal_rms),
                                   float(info3.dual_rms))
