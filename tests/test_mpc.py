"""MPC design matrices vs an independent numpy oracle."""

import numpy as np
import jax.numpy as jnp

from mpc_sensorlessao_tpu.models import mpc


def _setup(seed=0, nx=3, nu=2, N=4):
    rng = np.random.default_rng(seed)
    A1 = 0.5 * np.eye(nx) + 0.1 * rng.normal(size=(nx, nx))
    A2 = 0.2 * np.eye(nx) + 0.1 * rng.normal(size=(nx, nx))
    B = rng.normal(size=(nx, nu))
    Q = 10.0 * np.eye(nx)
    P = 10.0 * np.eye(nx)
    R = np.eye(nu)
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    mats = mpc.design_matrices(f32(A1), f32(A2), f32(B), N, f32(Q), f32(P),
                               f32(R))
    return (A1, A2, B, Q, P, R, N), mats


def _oracle_m1m2(A1, A2, N):
    """Direct transcription of main.mlx CDATA 13 in numpy."""
    nx = A1.shape[0]
    M1 = np.zeros((nx * N, nx))
    M2 = np.zeros((nx * N, nx))
    for i in range(N):
        if i == 0:
            M1[:nx], M2[:nx] = A1, A2
        elif i == 1:
            M1[nx:2 * nx] = A1 @ A1 + A2
            M2[nx:2 * nx] = A1 @ A2
        else:
            M1[i * nx:(i + 1) * nx] = (A1 @ M1[(i - 1) * nx:i * nx]
                                       + A2 @ M1[(i - 2) * nx:(i - 1) * nx])
            M2[i * nx:(i + 1) * nx] = M1[(i - 1) * nx:i * nx] @ A2
    return M1, M2


def test_free_response_recursion():
    (A1, A2, B, Q, P, R, N), mats = _setup()
    M1o, M2o = _oracle_m1m2(A1, A2, N)
    np.testing.assert_allclose(np.asarray(mats.M1), M1o, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mats.M2), M2o, rtol=2e-5, atol=1e-5)


def test_hessian_and_blockdiag():
    (A1, A2, B, Q, P, R, N), mats = _setup()
    nx, nu = B.shape
    Bc = np.kron(np.eye(N), B)
    Qt = np.kron(np.eye(N), Q)
    Qt[-nx:, -nx:] = P
    Rt = np.kron(np.eye(N), R)
    Ho = 0.5 * (Bc.T @ Qt @ Bc + (Bc.T @ Qt @ Bc).T) + Rt
    np.testing.assert_allclose(np.asarray(mats.H), Ho, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mats.B_conv), Bc, atol=1e-6)


def test_ramp_matrix():
    E = np.asarray(mpc.ramp_difference_matrix(2, 3))
    U = np.array([1.0, 2.0, 4.0, 7.0, 11.0, 16.0])
    dU = E @ U
    np.testing.assert_allclose(dU, [1, 2, 3, 5, 7, 9])
    # N=1 -> identity (main.mlx CDATA 13)
    np.testing.assert_allclose(np.asarray(mpc.ramp_difference_matrix(3, 1)),
                               np.eye(3))


def test_gradient_and_closed_form_optimality():
    (A1, A2, B, Q, P, R, N), mats = _setup()
    rng = np.random.default_rng(5)
    nx, nu = B.shape
    x0 = jnp.asarray(rng.normal(size=nx), dtype=jnp.float32)
    x0p = jnp.asarray(rng.normal(size=nx), dtype=jnp.float32)
    bref = mpc.b_ref(mats, jnp.asarray(rng.normal(size=nu), jnp.float32),
                     jnp.zeros(nu, jnp.float32))
    r, c, x_free = mpc.gradient_terms(mats, x0, x0p, bref)
    U = mpc.closed_form_solve(mats, r) if hasattr(mpc, "closed_form_solve") \
        else r @ mats.closed_form.T
    # optimality: 2HU + r = 0
    resid = 2 * np.asarray(mats.H) @ np.asarray(U) + np.asarray(r)
    assert np.linalg.norm(resid) / np.linalg.norm(np.asarray(r)) < 1e-4
    # cost at optimum below nearby points
    J0 = float(mpc.cost(mats, U, r, c))
    for _ in range(5):
        dU = jnp.asarray(rng.normal(size=U.shape) * 0.1, jnp.float32)
        assert float(mpc.cost(mats, U + dU, r, c)) >= J0 - 1e-3


def test_b_ref_and_predicted_states_batched():
    (A1, A2, B, Q, P, R, N), mats = _setup()
    rng = np.random.default_rng(6)
    nu = B.shape[1]
    u1 = jnp.asarray(rng.normal(size=(7, nu)), jnp.float32)
    u2 = jnp.asarray(rng.normal(size=(7, nu)), jnp.float32)
    br = mpc.b_ref(mats, u1, u2)
    assert br.shape == (7, N * B.shape[0])
    oracle = -(np.asarray(u1) @ np.asarray(mats.M1B).T
               + np.asarray(u2) @ np.asarray(mats.M2B).T)
    np.testing.assert_allclose(np.asarray(br), oracle, rtol=1e-5, atol=1e-5)
