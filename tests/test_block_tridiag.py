"""Cyclic-reduction block solves (long-horizon KKT path)."""

import numpy as np
import jax
import jax.numpy as jnp

from mpc_sensorlessao_tpu.ops import block_tridiag as bt
from mpc_sensorlessao_tpu.ops import newton_kkt
from mpc_sensorlessao_tpu.models import solvers


def _make_tridiag(rng, J, n):
    Ld = [np.linalg.qr(rng.normal(size=(n, n)))[0] + 2 * np.eye(n)
          for _ in range(J)]
    Ls = [0.3 * rng.normal(size=(n, n)) for _ in range(J)]
    diag, sub = [], [np.zeros((n, n))]
    for j in range(J):
        d = Ld[j] @ Ld[j].T
        if j > 0:
            d = d + Ls[j] @ Ls[j].T
            sub.append(Ls[j] @ Ld[j - 1].T)
        diag.append(d)
    return np.array(diag), np.array(sub)


def _dense_tridiag(diag, sub):
    J, n, _ = diag.shape
    S = np.zeros((J * n, J * n))
    for j in range(J):
        S[j * n:(j + 1) * n, j * n:(j + 1) * n] = diag[j]
        if j > 0:
            S[j * n:(j + 1) * n, (j - 1) * n:j * n] = sub[j]
            S[(j - 1) * n:j * n, j * n:(j + 1) * n] = sub[j].T
    return S


def test_cr_solve_matches_dense():
    rng = np.random.default_rng(0)
    for J, n in [(1, 3), (2, 3), (5, 4), (17, 3), (64, 5)]:
        diag, sub = _make_tridiag(rng, J, n)
        S = _dense_tridiag(diag, sub)
        b = rng.normal(size=(J, n))
        x = np.asarray(bt.cr_solve(jnp.asarray(diag), jnp.asarray(sub),
                                   jnp.asarray(b)))
        xd = np.linalg.solve(S, b.ravel()).reshape(J, n)
        rel = np.abs(x - xd).max() / np.abs(xd).max()
        assert rel < 5e-4, (J, n, rel)    # float32 path


def _make_banded(rng, T, n):
    Lfull = np.zeros((T * n, T * n))
    for t in range(T):
        Lfull[t * n:(t + 1) * n, t * n:(t + 1) * n] = \
            np.linalg.qr(rng.normal(size=(n, n)))[0] + 2.5 * np.eye(n)
        if t >= 1:
            Lfull[t * n:(t + 1) * n, (t - 1) * n:t * n] = \
                0.3 * rng.normal(size=(n, n))
        if t >= 2:
            Lfull[t * n:(t + 1) * n, (t - 2) * n:(t - 1) * n] = \
                0.2 * rng.normal(size=(n, n))
    S = Lfull @ Lfull.T
    z = np.zeros((n, n))
    diag = np.array([S[t * n:(t + 1) * n, t * n:(t + 1) * n]
                     for t in range(T)])
    sub1 = np.array([S[t * n:(t + 1) * n, (t - 1) * n:t * n] if t >= 1
                     else z for t in range(T)])
    sub2 = np.array([S[t * n:(t + 1) * n, (t - 2) * n:(t - 1) * n]
                     if t >= 2 else z for t in range(T)])
    return S, diag, sub1, sub2


def test_banded_solve_matches_dense():
    rng = np.random.default_rng(1)
    for T, n in [(2, 3), (3, 3), (7, 4), (31, 4), (64, 3)]:
        S, diag, sub1, sub2 = _make_banded(rng, T, n)
        b = rng.normal(size=(T, n))
        x = np.asarray(bt.banded_solve(
            jnp.asarray(diag), jnp.asarray(sub1), jnp.asarray(sub2),
            jnp.asarray(b)))
        xd = np.linalg.solve(S, b.ravel()).reshape(T, n)
        rel = np.abs(x - xd).max() / np.abs(xd).max()
        assert rel < 5e-4, (T, n, rel)


def _random_problem(rng, n, m, horizon):
    A1 = jnp.asarray(0.5 * np.eye(n) + 0.1 * rng.normal(size=(n, n)),
                     jnp.float32)
    A2 = jnp.asarray(0.2 * np.eye(n), jnp.float32)
    B = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    return solvers.make_fastmpc_problem(
        A1, A2, B, q_weight=10.0, p_weight=10.0, r_weight=1.0,
        u_max=5.0, barrier_k=1e-2)


def test_long_horizon_newton_matches_dense_path(monkeypatch):
    """T=32 (CR path) must reproduce the dense-Schur Newton direction."""
    rng = np.random.default_rng(2)
    n, m, T = 5, 7, 32
    prob = _random_problem(rng, n, m, T)
    x0 = jnp.asarray(rng.normal(size=n), jnp.float32)
    x0p = jnp.asarray(rng.normal(size=n), jnp.float32)
    w = jnp.asarray(0.1 * rng.normal(size=(T, n)), jnp.float32)

    assert T >= newton_kkt.CR_MIN_HORIZON
    st_cr = newton_kkt.solve(prob, x0, x0p, w, horizon=T, n_newton=3)

    monkeypatch.setattr(newton_kkt, "CR_MIN_HORIZON", 10_000)
    st_dense = jax.jit(
        newton_kkt.solve.__wrapped__,
        static_argnames=("horizon", "n_newton", "line_search", "ramp"),
    )(prob, x0, x0p, w, horizon=T, n_newton=3)

    np.testing.assert_allclose(np.asarray(st_cr.U), np.asarray(st_dense.U),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(st_cr.X), np.asarray(st_dense.X),
                               rtol=2e-3, atol=2e-4)


def test_long_horizon_solution_quality():
    """T=64: the CR-path solve must satisfy the KKT system (residual
    reduction vs the initial point) and stay strictly feasible."""
    rng = np.random.default_rng(3)
    n, m, T = 4, 6, 64
    prob = _random_problem(rng, n, m, T)
    x0 = jnp.asarray(rng.normal(size=n), jnp.float32)
    x0p = jnp.asarray(rng.normal(size=n), jnp.float32)
    w = jnp.asarray(0.05 * rng.normal(size=(T, n)), jnp.float32)

    b = newton_kkt.equality_rhs(prob, x0, x0p, w, T)
    st0 = newton_kkt.init_state(prob, T, 0.0)
    r0 = newton_kkt.residual_norm(
        *newton_kkt.residuals(prob, b, st0))
    st = newton_kkt.solve(prob, x0, x0p, w, horizon=T, n_newton=8)
    r = newton_kkt.residual_norm(*newton_kkt.residuals(prob, b, st))
    assert float(r) < 1e-2 * float(r0)
    assert bool(jnp.all(jnp.abs(st.U) < prob.u_max[0]))
