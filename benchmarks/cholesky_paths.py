"""Batched small-matrix factorization micro-benchmark.

Times the pieces that decide whether a custom Pallas batched-Cholesky
kernel would pay for the general (n_newton > 1) solver path:

  raw-chol:    vmapped cho_factor+cho_solve of (B, Tn, Tn) SPD systems
               (what every extra Newton iteration costs today)
  inv-matmul:  precomputed inverse applied as one batched matmul
               (the fixed-operator real-time path's shape)
  newton1/2:   end-to-end structured solves at n_newton = 1 / 2

If raw-chol is within ~2x of inv-matmul's cost per iteration, XLA's
batched Cholesky is already fine and a Pallas kernel is not worth its
complexity; a >>2x gap is the signal to build one.

Usage: python benchmarks/cholesky_paths.py [batch] [nx] [horizon]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

try:
    import mpc_sensorlessao_tpu  # noqa: F401  (installed package)
except ImportError:  # source checkout without `pip install -e .`
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
from mpc_sensorlessao_tpu.models import solvers          # noqa: E402
from mpc_sensorlessao_tpu.ops import newton_kkt          # noqa: E402


def timeit(fn, *args, repeats=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    nx = int(sys.argv[2]) if len(sys.argv) > 2 else 27
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    m = 144
    d = T * nx
    rng = np.random.default_rng(0)
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)

    L = rng.normal(size=(batch, d, d)) * 0.1
    S = np.einsum("bij,bkj->bik", L, L) + 3.0 * np.eye(d)
    b = rng.normal(size=(batch, d))
    Sj, bj = f32(S), f32(b)

    chol_solve = jax.jit(jax.vmap(
        lambda s, r: jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(s, lower=True), r)))
    t = timeit(chol_solve, Sj, bj)
    print(f"raw-chol    (B={batch}, d={d}): {batch/t:12,.0f}/s "
          f"({t*1e6/batch:7.2f} us each)")

    Sinv = f32(np.linalg.inv(S[0]))
    inv_mm = jax.jit(lambda r: r @ Sinv.T)
    t = timeit(inv_mm, bj)
    print(f"inv-matmul  (B={batch}, d={d}): {batch/t:12,.0f}/s "
          f"({t*1e6/batch:7.2f} us each)")

    A1 = f32(0.9 * np.eye(nx) + 0.05 * rng.normal(size=(nx, nx)))
    A2 = f32(-0.3 * np.eye(nx))
    B = f32(rng.normal(size=(nx, m)) * 0.3)
    prob = solvers.make_fastmpc_problem(
        A1, A2, B, q_weight=1.5e4, p_weight=1.5e4, r_weight=1.0,
        u_max=28.0, barrier_k=1e-2)
    x0 = f32(rng.normal(size=(batch, nx)))
    x0p = f32(rng.normal(size=(batch, nx)))
    w = f32(rng.normal(size=(batch, T * nx)) * 0.1)
    for nn in (1, 2):
        fn = jax.jit(jax.vmap(
            lambda a, b_, c: newton_kkt.solve(prob, a, b_, c, horizon=T,
                                              n_newton=nn).U))
        t = timeit(fn, x0, x0p, w)
        print(f"newton x{nn}   (B={batch}, T={T}): {batch/t:12,.0f}/s "
              f"({t*1e6/batch:7.2f} us each)")


if __name__ == "__main__":
    main()
