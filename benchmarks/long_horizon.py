"""Long-horizon solver scaling: dense Schur Cholesky vs block cyclic
reduction (ops/block_tridiag.py).

The reference's dense factorization (inf_newton_solver.m:24-31) is
O(T^3 n^3); the CR path is O(T n^3) work at O(log T) depth.  This
benchmark sweeps the horizon at fixed batch and reports solves/s for
both Schur backends of the general structured Newton path.

Usage: python benchmarks/long_horizon.py [batch] [nx] [T1,T2,...]
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


def bench(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    nx = int(sys.argv[2]) if len(sys.argv) > 2 else 27
    Ts = ([int(t) for t in sys.argv[3].split(",")]
          if len(sys.argv) > 3 else [8, 16, 32, 64, 128])
    m = 144
    rng = np.random.default_rng(0)
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    A1 = f32(0.9 * np.eye(nx) + 0.05 * rng.normal(size=(nx, nx)))
    A2 = f32(-0.3 * np.eye(nx) + 0.02 * rng.normal(size=(nx, nx)))
    B = f32(rng.normal(size=(nx, m)) * 0.3)
    prob = solvers.make_fastmpc_problem(
        A1, A2, B, q_weight=1.5e4, p_weight=1.5e4, r_weight=1.0,
        u_max=28.0, barrier_k=1e-2)

    for T in Ts:
        x0 = f32(rng.normal(size=(batch, nx)))
        x0p = f32(rng.normal(size=(batch, nx)))
        w = f32(rng.normal(size=(batch, T * nx)) * 0.1)
        for name, thr in (("cyclic-red", 1), ("dense-chol", 10**6)):
            newton_kkt.CR_MIN_HORIZON = thr
            fn = jax.jit(jax.vmap(
                lambda a, b_, c: newton_kkt.solve.__wrapped__(
                    prob, a, b_, c, horizon=T, n_newton=1).U))
            dt = bench(fn, x0, x0p, w)
            print(f"T={T:4d} {name}: {batch / dt:10,.0f} solves/s "
                  f"({dt * 1e6 / batch:8.1f} us/solve)")


if __name__ == "__main__":
    main()
