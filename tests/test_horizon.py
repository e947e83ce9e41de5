"""Device-distributed block-tridiagonal solve (horizon parallelism)."""

import numpy as np
import jax
import jax.numpy as jnp

from mpc_sensorlessao_tpu.ops import block_tridiag
from mpc_sensorlessao_tpu.parallel import horizon


def _random_spd_tridiag(J, n, seed=0):
    rng = np.random.default_rng(seed)
    sub = rng.normal(size=(J, n, n)) * 0.3
    sub[0] = 0.0
    diag = np.zeros((J, n, n))
    for j in range(J):
        a = rng.normal(size=(n, n)) * 0.3
        diag[j] = a @ a.T + (2.0 + 2 * n) * np.eye(n)   # diag dominant
    rhs = rng.normal(size=(J, n))
    return (jnp.asarray(diag, jnp.float32), jnp.asarray(sub, jnp.float32),
            jnp.asarray(rhs, jnp.float32))


def _dense(diag, sub):
    J, n, _ = diag.shape
    S = np.zeros((J * n, J * n))
    for j in range(J):
        S[j*n:(j+1)*n, j*n:(j+1)*n] = np.asarray(diag[j])
        if j > 0:
            S[j*n:(j+1)*n, (j-1)*n:j*n] = np.asarray(sub[j])
            S[(j-1)*n:j*n, j*n:(j+1)*n] = np.asarray(sub[j]).T
    return S


def test_distributed_matches_dense_and_single_device():
    J, n = 32, 5
    diag, sub, rhs = _random_spd_tridiag(J, n)
    mesh = horizon.hz_mesh()
    x = np.asarray(horizon.solve_distributed(diag, sub, rhs, mesh))
    # dense oracle
    S = _dense(diag, sub)
    x_ref = np.linalg.solve(S, np.asarray(rhs).reshape(-1)).reshape(J, n)
    np.testing.assert_allclose(x, x_ref, rtol=2e-4, atol=2e-4)
    # single-device cyclic reduction agrees too
    x_cr = np.asarray(block_tridiag.cr_solve(diag, sub, rhs))
    np.testing.assert_allclose(x, x_cr, rtol=2e-4, atol=2e-4)


def test_distributed_various_chunk_sizes():
    mesh = horizon.hz_mesh()
    Pn = mesh.devices.size
    for mult in (3, 5):
        J, n = Pn * mult, 3
        diag, sub, rhs = _random_spd_tridiag(J, n, seed=J)
        x = np.asarray(horizon.solve_distributed(diag, sub, rhs, mesh))
        S = _dense(diag, sub)
        x_ref = np.linalg.solve(S, np.asarray(rhs).reshape(-1)).reshape(J, n)
        np.testing.assert_allclose(x, x_ref, rtol=5e-4, atol=5e-4)
