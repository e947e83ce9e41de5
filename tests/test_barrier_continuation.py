"""Barrier continuation (mpc_solve_full / mpc_fixed_newton equivalents)."""

import numpy as np
import scipy.optimize as sopt
import jax.numpy as jnp

from mpc_sensorlessao_tpu.models import solvers
from mpc_sensorlessao_tpu.ops import newton_kkt


def test_continuation_approaches_constrained_qp_optimum():
    rng = np.random.default_rng(3)
    n, m, T = 3, 2, 3
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    A1 = f32(0.5 * np.eye(n))
    A2 = f32(0.1 * np.eye(n))
    B = f32(rng.normal(size=(n, m)))
    prob = solvers.make_fastmpc_problem(A1, A2, B, 10.0, 10.0, 1.0, 0.6,
                                        barrier_k=1e-2)
    x0 = f32(rng.normal(size=n))
    x0_pre = f32(rng.normal(size=n))
    w = f32(rng.normal(size=T * n) * 2.0)  # strong -> bounds active

    state = newton_kkt.solve_barrier_continuation(
        prob, x0, x0_pre, w, horizon=T)

    # exact QP optimum via scipy (k -> 0 limit)
    dp = solvers.assemble_dense(
        jnp.diag(prob.q_diag), jnp.diag(prob.r_diag), jnp.diag(prob.qf_diag),
        A1, A2, B, w, x0, x0_pre, jnp.zeros(m), prob.u_min, prob.u_max,
        jnp.zeros(m), jnp.zeros(m), horizon=T, ramp=False, barrier_k=1e-2)
    H = np.asarray(dp.H, np.float64)
    C = np.asarray(dp.C, np.float64)
    b = np.asarray(dp.b, np.float64)
    P = np.asarray(dp.P, np.float64)
    h = np.asarray(dp.h, np.float64)
    res = sopt.minimize(
        lambda z: z @ H @ z, np.asarray(dp.z_init, np.float64),
        constraints=[{"type": "eq", "fun": lambda z: C @ z - b},
                     {"type": "ineq", "fun": lambda z: h - P @ z}],
        method="SLSQP", options={"maxiter": 800, "ftol": 1e-12})
    assert res.success
    U_ref, _ = solvers.unpack_controls(jnp.asarray(res.x, jnp.float32),
                                       n, m, T)
    # continuation ends at k*len(z) < 1e-2 -> near the exact optimum
    np.testing.assert_allclose(np.asarray(state.U), np.asarray(U_ref),
                               atol=0.02)
    # bounds strictly respected
    assert np.all(np.abs(np.asarray(state.U)) < 0.6)
