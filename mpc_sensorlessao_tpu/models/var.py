"""VAR(p) system identification of Zernike-coefficient dynamics.

Re-implements the reference's time-series identification
(reference: README.md:107-155): lagged least squares
PARA = (AA'AA)^-1 AA' BB over the training window, VAR matrices
A_j = PARA_j', plus held-out validation RMSE/RRMSE.

Conventions: we use the column form x[k] = sum_j A_j x[k-j] + w[k]
(A_j = PARA block transposed, reference README.md:129-130); the reference's
later double-transpose (README.md:286-287) applies only to its re-loaded
.mat workflow.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import flax.struct as struct
import jax
import jax.numpy as jnp


@struct.dataclass
class VARModel:
    """Identified VAR model; A has shape (order, nx, nx)."""

    A: jnp.ndarray
    order: int = struct.field(pytree_node=False)

    @property
    def nx(self) -> int:
        return self.A.shape[-1]

    def coefficient(self, j: int) -> jnp.ndarray:
        """A_j for lag j in 1..order."""
        return self.A[j - 1]


def lag_matrix(series: jnp.ndarray, order: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build (AA, BB): AA rows = [x[i-1], ..., x[i-p]], targets x[i].

    series: (T, nx).  Matches README.md:120-125 block layout (lag j occupies
    columns (j-1)*nx:(j)*nx).
    """
    T = series.shape[0]
    blocks = [series[order - j:T - j] for j in range(1, order + 1)]
    AA = jnp.concatenate(blocks, axis=1)        # (T-p, p*nx)
    BB = series[order:]                          # (T-p, nx)
    return AA, BB


@partial(jax.jit, static_argnames=("order",))
def fit(series: jnp.ndarray, order: int) -> VARModel:
    """Least-squares VAR fit over the given window (README.md:127-130)."""
    AA, BB = lag_matrix(series, order)
    gram = AA.T @ AA
    para = jnp.linalg.solve(gram, AA.T @ BB)     # (p*nx, nx)
    nx = series.shape[1]
    A = jnp.stack([para[(j - 1) * nx:j * nx].T for j in range(1, order + 1)])
    return VARModel(A=A, order=order)


def predict_one_step(model: VARModel, history: jnp.ndarray) -> jnp.ndarray:
    """x_hat[k] from history[..., -j, :] = x[k-j]."""
    out = 0.0
    for j in range(1, model.order + 1):
        out = out + history[..., -j, :] @ model.A[j - 1].T
    return out


def validate(model: VARModel, series: jnp.ndarray):
    """One-step-ahead predictions and per-mode RMSE / RRMSE over a window.

    Mirrors README.md:135-155 (the validation loop keys off the train/test
    boundary; here the caller passes the window including `order` warmup
    samples at the front).
    """
    AA, BB = lag_matrix(series, model.order)
    nx = model.nx
    para = jnp.concatenate(
        [model.A[j - 1].T for j in range(1, model.order + 1)], axis=0)
    pred = AA @ para
    err = pred - BB
    rmse = jnp.sqrt(jnp.mean(err ** 2, axis=0))
    spread = jnp.max(BB, axis=0) - jnp.min(BB, axis=0)
    rrmse = rmse / spread
    return pred, rmse, rrmse
