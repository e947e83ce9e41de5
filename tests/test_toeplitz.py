"""Toeplitz-block-Toeplitz operator (toeplitzBlockToeplitz.m)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpc_sensorlessao_tpu.ops import phase_stats, toeplitz
from mpc_sensorlessao_tpu.utils.config import AtmosphereConfig


@pytest.fixture(scope="module")
def rect_op():
    rng = np.random.default_rng(0)
    nBr, nBc, nR, nC = 4, 3, 5, 6
    gen = rng.normal(size=(nBr + nBc - 1, nR + nC - 1))
    return toeplitz.build((nBr, nBc), (nR, nC), gen)


def test_full_structure(rect_op):
    """Dense materialization is block-Toeplitz with Toeplitz blocks."""
    M = toeplitz.full(rect_op)
    assert M.shape == rect_op.shape
    nR, nC = rect_op.n_inner
    b00 = M[:nR, :nC]
    b11 = M[nR:2 * nR, nC:2 * nC]
    np.testing.assert_allclose(b00, b11)                 # block Toeplitz
    np.testing.assert_allclose(np.diag(b00, 1), b00[0, 1])  # Toeplitz block
    assert rect_op.compression > 3


def test_matvec_matches_dense(rect_op):
    M = toeplitz.full(rect_op)
    rng = np.random.default_rng(1)
    x = rng.normal(size=rect_op.shape[1]).astype(np.float32)
    y = toeplitz.matvec(rect_op, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), M @ x, rtol=1e-4, atol=1e-4)


def test_matvec_batched(rect_op):
    rng = np.random.default_rng(2)
    X = rng.normal(size=(7, rect_op.shape[1])).astype(np.float32)
    Y = np.asarray(toeplitz.matvec(rect_op, jnp.asarray(X)))
    M = toeplitz.full(rect_op)
    np.testing.assert_allclose(Y, X @ M.T, rtol=1e-4, atol=1e-4)


def test_transpose(rect_op):
    Mt = toeplitz.full(toeplitz.transpose(rect_op))
    np.testing.assert_allclose(Mt, toeplitz.full(rect_op).T)


def test_solve_roundtrip():
    """Square SPD system (Gaussian kernel + nugget): solve then matvec
    recovers b."""
    op = toeplitz.from_stationary(
        lambda r: np.exp(-r * r) + 0.5 * (r == 0), n=8, pitch=0.5)
    M = toeplitz.full(op)
    np.testing.assert_allclose(M, M.T, atol=1e-6)        # symmetric
    b = np.random.default_rng(3).normal(size=op.shape[0])
    x = toeplitz.solve(op, b)
    y = np.asarray(toeplitz.matvec(op, jnp.asarray(x, jnp.float32)))
    np.testing.assert_allclose(y, b, atol=5e-3)


def test_covariance_operator_matches_dense_covariance():
    """from_stationary reproduces phase_stats.covariance_matrix on the
    same grid (the slopesLinearMMSE storage role)."""
    atm = AtmosphereConfig()
    n, pitch = 6, 0.1
    op = toeplitz.from_stationary(
        lambda r: phase_stats.covariance(r, atm), n=n, pitch=pitch)
    g = np.arange(n) * pitch
    X, Y = np.meshgrid(g, g, indexing="ij")
    pts = (X + 1j * Y).ravel()
    dense = phase_stats.covariance_matrix(pts, pts, atm)
    np.testing.assert_allclose(toeplitz.full(op), dense, rtol=1e-5,
                               atol=1e-7)
