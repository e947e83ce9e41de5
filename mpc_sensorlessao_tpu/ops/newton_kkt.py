"""Batched fixed-barrier infeasible-start Newton KKT solves ("fastMPC").

TPU-first re-design of the reference solver stack
(reference: Fast_MPC/VAR_2/{inf_newton_solver.m, inf_newton_KKT_H.m,
fast_mpc_objective.m, fast_mpc_eq_const.m, fast_mpc_ineq_const.m,
fast_mpc_init.m, backtracking_inf_newton.m}).  Same mathematics --

  minimize  z'Hz + g'z + k * sum(-log(h - Pz))   s.t.  Cz = b

with z = (u_0, x_1, u_1, x_2, ..., u_{T-1}, x_T), one (or a fixed number
of) infeasible-start Newton steps, barrier k fixed, midpoint primal init --
but a completely different computational shape:

* instead of dense T(n+m) Cholesky + dense Schur (inf_newton_solver.m:24-31,
  which ignores the problem's stage structure), the primal Hessian
  Phi = 2H + k P' D P is handled *blockwise* (it is stage-block-diagonal for
  box constraints, fast_mpc_ineq_const.m:42-56), and the dual Schur
  complement S = C Phi^-1 C' is assembled as a block-banded matrix (n x n
  blocks, bandwidth = VAR order) and factorized once per iteration;
* state is kept as (T, m) control / (T, n) state arrays, so every operation
  is a batched matmul and the whole solver `vmap`s over thousands of
  scenarios into MXU-shaped einsums;
* the backtracking line search (backtracking_inf_newton.m:3-9, whose loop
  guard never decrements -- a latent infinite loop) becomes a fixed bank of
  candidate step sizes evaluated in parallel, with explicit slack-positivity
  rejection;
* the reference's *random* dual initialization (inf_newton_solver.m:2) is
  replaced by nu=0: for a full Newton step the resulting iterate
  (z+dz, nu+dnu) is exactly independent of the dual init -- S(nu+dnu) =
  rp - C Phi^-1 rd(0) regardless of nu -- so this is equivalence-preserving
  whenever the unit step is accepted, and deterministic.

Costs here are diagonal (the reference pipeline uses scalar * I weights,
README.md:344-346); `solvers.fastmpc_dense` covers general dense costs and
arbitrary inequality rows as a cross-check oracle.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class FastMPCProblem(NamedTuple):
    """Static problem data (per scenario; vmap-compatible).

    A1, A2: (n, n) VAR coefficients (A2 zeros for VAR(1));
    B: (n, m) modal influence;
    q_diag, qf_diag: (n,) stage / terminal state cost diagonals;
    r_diag: (m,) control cost diagonal;
    u_min, u_max: (m,) box bounds (fast_mpc_ineq_const box rows);
    barrier_k: scalar fixed log-barrier parameter.
    """

    A1: jnp.ndarray
    A2: jnp.ndarray
    B: jnp.ndarray
    q_diag: jnp.ndarray
    qf_diag: jnp.ndarray
    r_diag: jnp.ndarray
    u_min: jnp.ndarray
    u_max: jnp.ndarray
    barrier_k: jnp.ndarray


class SolverState(NamedTuple):
    U: jnp.ndarray    # (T, m)
    X: jnp.ndarray    # (T, n); X[t] holds x_{t+1}
    nu: jnp.ndarray   # (T, n) equality multipliers


def init_state(prob: FastMPCProblem, horizon: int, x_box: float) -> SolverState:
    """Strictly feasible midpoint init (fast_mpc_init.m:19-27): u and x at
    box midpoints; x box is +/-x_box (inactive, README.md:538) -> 0."""
    m = prob.u_min.shape[-1]
    n = prob.A1.shape[-1]
    u0 = jnp.broadcast_to((prob.u_min + prob.u_max) / 2.0, (horizon, m))
    return SolverState(
        U=u0,
        X=jnp.zeros((horizon, n), dtype=u0.dtype),
        nu=jnp.zeros((horizon, n), dtype=u0.dtype),
    )


def equality_rhs(prob: FastMPCProblem, x0, x0_pre, w, horizon: int):
    """Stacked equality rhs b (fast_mpc_eq_const.m:38-46):

    b_0 = A1 x0 + A2 x0_pre + w_0 ; b_1 = A2 x0 + w_1 ; b_i = w_i.
    ``w`` is the per-stage offset (the sim passes b_ref, README.md:546).
    """
    b = w.reshape(horizon, -1)
    b0 = b[0] + prob.A1 @ x0 + prob.A2 @ x0_pre
    rows = [b0]
    if horizon > 1:
        rows.append(b[1] + prob.A2 @ x0)
        rows.extend(b[2:])
    return jnp.stack(rows) if horizon > 1 else b0[None]


def _shift_down(arr, k):
    """out[t] = arr[t-k] with zero padding (stage-index shifts)."""
    pad = jnp.zeros((k,) + arr.shape[1:], dtype=arr.dtype)
    return jnp.concatenate([pad, arr[:-k]], axis=0) if k else arr


def _shift_up(arr, k):
    """out[t] = arr[t+k] with zero padding."""
    pad = jnp.zeros((k,) + arr.shape[1:], dtype=arr.dtype)
    return jnp.concatenate([arr[k:], pad], axis=0) if k else arr


def residuals(prob: FastMPCProblem, b, state: SolverState):
    """Dual and primal residuals (inf_newton_solver.m:12-13).

    rd_u = 2 R u + k P'd|_u - B' nu_t
    rd_x = 2 Qt x + nu_t - A1' nu_{t+1} - A2' nu_{t+2}
    rp_i = x_{i+1} - A1 x_i - A2 x_{i-1} - B u_i - b_i
    """
    U, X, nu = state
    T = U.shape[0]
    d_hi = 1.0 / (prob.u_max - U)
    d_lo = 1.0 / (U - prob.u_min)
    k = prob.barrier_k

    rd_u = 2.0 * prob.r_diag * U + k * (d_hi - d_lo) - nu @ prob.B
    q_stack = jnp.concatenate(
        [jnp.broadcast_to(prob.q_diag, (T - 1, X.shape[1])),
         prob.qf_diag[None]], axis=0) if T > 1 else prob.qf_diag[None]
    rd_x = (2.0 * q_stack * X + nu
            - _shift_up(nu, 1) @ prob.A1
            - _shift_up(nu, 2) @ prob.A2)

    rp = (X - _shift_down(X, 1) @ prob.A1.T - _shift_down(X, 2) @ prob.A2.T
          - U @ prob.B.T - b)
    return rd_u, rd_x, rp


def residual_norm(rd_u, rd_x, rp):
    return jnp.sqrt(jnp.sum(rd_u ** 2) + jnp.sum(rd_x ** 2)
                    + jnp.sum(rp ** 2))


def newton_direction(prob: FastMPCProblem, b, state: SolverState):
    """One Newton direction via blockwise Phi and block-banded Schur.

    Follows inf_newton_solver.m:24-35 mathematically, exploiting:
      Phi_u[t] = 2R + k diag(d_hi^2 + d_lo^2)   (diagonal),
      Phi_x[t] = 2 Q_t                          (diagonal),
      S = C Phi^-1 C'  block-banded with bandwidth 2 (VAR(2)).
    """
    U, X, nu = state
    T, m = U.shape
    n = X.shape[1]
    k = prob.barrier_k
    A1, A2, B = prob.A1, prob.A2, prob.B

    d_hi = 1.0 / (prob.u_max - U)
    d_lo = 1.0 / (U - prob.u_min)
    phi_u = 2.0 * prob.r_diag + k * (d_hi ** 2 + d_lo ** 2)   # (T, m)
    q_stack = jnp.concatenate(
        [jnp.broadcast_to(prob.q_diag, (T - 1, n)), prob.qf_diag[None]],
        axis=0) if T > 1 else prob.qf_diag[None]
    phi_x = 2.0 * q_stack                                      # (T, n)
    pu = 1.0 / phi_u
    px = 1.0 / phi_x

    rd_u, rd_x, rp = residuals(prob, b, state)

    # W[t] = B diag(pu_t) B'  -> (T, n, n)
    W = jnp.einsum("nm,tm,km->tnk", B, pu, B)

    # C Phi^-1 rd  (row i)  (see module docstring for C's stage pattern)
    ru = rd_u * pu
    rx = rd_x * px
    c_phinv_rd = (-ru @ B.T + rx
                  - _shift_down(rx, 1) @ A1.T
                  - _shift_down(rx, 2) @ A2.T)
    beta = -rp + c_phinv_rd                                    # (T, n)

    # Block-banded S assembly (diag + two sub-diagonals), then dense chol
    # on the small (T n, T n) system.
    px1 = _shift_down(px, 1)                                   # px_{i-1}
    px2 = _shift_down(px, 2)
    diag_blocks = (W + jnp.eye(n, dtype=U.dtype) * px[:, None, :]
                   + jnp.einsum("nk,tk,mk->tnm", A1, px1, A1)
                   + jnp.einsum("nk,tk,mk->tnm", A2, px2, A2))
    sub1_blocks = (-A1 * px1[:, None, :]
                   + jnp.einsum("nk,tk,mk->tnm", A2, px2, A1))  # S[i, i-1]
    sub2_blocks = -A2 * px2[:, None, :]                         # S[i, i-2]

    S = jnp.zeros((T, n, T, n), dtype=U.dtype)
    for i in range(T):
        S = S.at[i, :, i, :].set(diag_blocks[i])
        if i >= 1:
            S = S.at[i, :, i - 1, :].set(sub1_blocks[i])
            S = S.at[i - 1, :, i, :].set(sub1_blocks[i].T)
        if i >= 2:
            S = S.at[i, :, i - 2, :].set(sub2_blocks[i])
            S = S.at[i - 2, :, i, :].set(sub2_blocks[i].T)
    S = S.reshape(T * n, T * n)

    chol = jax.scipy.linalg.cho_factor(S, lower=True)
    dnu = -jax.scipy.linalg.cho_solve(chol, beta.reshape(-1)).reshape(T, n)

    # dz = Phi^-1 (-rd - C' dnu)
    dU = (-rd_u + dnu @ B) * pu
    ct_dnu_x = dnu - _shift_up(dnu, 1) @ A1 - _shift_up(dnu, 2) @ A2
    dX = (-rd_x - ct_dnu_x) * px
    return dU, dX, dnu


def line_search_step(prob, b, state, direction,
                     alpha=1e-4, beta=0.5, n_candidates=16):
    """Parallel-candidate norm-descent backtracking.

    Replaces the sequential while-loop (backtracking_inf_newton.m:3-9) with
    a fixed bank t in {1, beta, beta^2, ...}: accept the largest t whose
    residual norm satisfies the Armijo-style decrease AND keeps the control
    strictly inside its box (slack positivity; the reference omits this
    check).  Fixed shapes, no data-dependent control flow.
    """
    dU, dX, dnu = direction
    base = residual_norm(*residuals(prob, b, state))
    ts = beta ** jnp.arange(n_candidates, dtype=state.U.dtype)

    def eval_candidate(t):
        cand = SolverState(state.U + t * dU, state.X + t * dX,
                           state.nu + t * dnu)
        norm = residual_norm(*residuals(prob, b, cand))
        feasible = jnp.logical_and(
            jnp.all(cand.U < prob.u_max), jnp.all(cand.U > prob.u_min))
        ok = jnp.logical_and(norm <= (1.0 - alpha * t) * base, feasible)
        return ok, norm

    oks, _ = jax.vmap(eval_candidate)(ts)
    # first accepted candidate; fall back to the smallest step
    idx = jnp.argmax(oks)
    t = jnp.where(jnp.any(oks), ts[idx], ts[-1])
    return SolverState(state.U + t * dU, state.X + t * dX,
                       state.nu + t * dnu)


@partial(jax.jit, static_argnames=("horizon", "n_newton", "line_search"))
def solve(prob: FastMPCProblem, x0, x0_pre, w,
          horizon: int, n_newton: int = 1, x_box: float = 100.0,
          line_search: bool = True) -> SolverState:
    """Fixed-barrier fixed-Newton solve (= mpc_fixed_log_newton,
    Fast_MPC2.m:124-130).  Single scenario; `vmap` for batches."""
    b = equality_rhs(prob, x0, x0_pre, w, horizon)
    state = init_state(prob, horizon, x_box)

    def body(_, st):
        direction = newton_direction(prob, b, st)
        if line_search:
            return line_search_step(prob, b, st, direction)
        dU, dX, dnu = direction
        return SolverState(st.U + dU, st.X + dX, st.nu + dnu)

    if n_newton <= 2:
        for i in range(n_newton):
            state = body(i, state)
    else:
        state = jax.lax.fori_loop(0, n_newton, body, state)
    return state


def solve_barrier_continuation(prob: FastMPCProblem, x0, x0_pre, w,
                               horizon: int, k_start: float = 1.0,
                               mu: float = 0.1, k_min_scaled: float = 1e-2,
                               n_newton_inner: int = 20) -> SolverState:
    """Barrier continuation k <- mu k until k*len(z) < k_min_scaled
    (= mpc_fixed_newton / mpc_solve_full, Fast_MPC2.m:100-115,131-144),
    with a *static* schedule so shapes stay fixed under jit."""
    m = prob.u_min.shape[-1]
    n = prob.A1.shape[-1]
    z_len = horizon * (n + m)
    ks = []
    k = k_start
    while k * z_len >= k_min_scaled:
        ks.append(k)
        k *= mu
    b = equality_rhs(prob, x0, x0_pre, w, horizon)
    state = init_state(prob, horizon, 100.0)
    for k in ks:
        p = prob._replace(barrier_k=jnp.asarray(k, dtype=state.U.dtype))

        def body(_, st):
            return line_search_step(p, b, st, newton_direction(p, b, st))

        state = jax.lax.fori_loop(0, n_newton_inner, body, state)
    return state
