"""Pure QP-solver throughput: batched fastMPC solves/s (no optics).

Measures the metric kernel from BASELINE.json ("aggregate MPC solves/s")
in isolation: the 27-state/144-input AO problem at the reference horizon,
batched over scenarios.  Compares the general structured path and the
constant-slack fixed-operator path.

Usage: python benchmarks/solver_throughput.py [batch] [horizon] [nx]
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


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    nx = int(sys.argv[3]) if len(sys.argv) > 3 else 27
    m = 144
    rng = np.random.default_rng(0)
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    A1 = f32(0.9 * np.eye(nx) + 0.05 * rng.normal(size=(nx, nx)))
    A2 = f32(-0.3 * np.eye(nx) + 0.02 * rng.normal(size=(nx, nx)))
    B = f32(rng.normal(size=(nx, m)) * 0.3)
    prob = solvers.make_fastmpc_problem(
        A1, A2, B, q_weight=1.5e4, p_weight=1.5e4, r_weight=1.0,
        u_max=28.0, barrier_k=1e-2)
    op = newton_kkt.precompute_fixed_newton(prob, T)

    x0 = f32(rng.normal(size=(batch, nx)))
    x0p = f32(rng.normal(size=(batch, nx)))
    w = f32(rng.normal(size=(batch, T * nx)) * 0.1)

    paths = {
        "fixed_op": jax.jit(jax.vmap(
            lambda a, b_, c: newton_kkt.solve_fixed(prob, op, a, b_, c,
                                                    horizon=T).U)),
        "structured": jax.jit(jax.vmap(
            lambda a, b_, c: newton_kkt.solve(prob, a, b_, c, horizon=T,
                                              n_newton=1).U)),
    }
    for name, fn in paths.items():
        out = fn(x0, x0p, w)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(x0, x0p, w))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:12s} batch={batch} T={T} nx={nx}: "
              f"{batch / best:,.0f} solves/s ({best*1e6/batch:.2f} us/solve)")


if __name__ == "__main__":
    main()
